"""Utils tier: run-dir layout and tee logging."""

from multimodalsignal_tpu.utils import TeeLogger, make_run_dir


def test_make_run_dir(tmp_path):
    d = make_run_dir(tmp_path, "my_experiment")
    assert d.exists()
    assert d.parent.name == "my_experiment"
    assert d.name.startswith("run_")


def test_tee_logger(tmp_path, capsys):
    log = TeeLogger(tmp_path / "log.txt", header="hello")
    log("line one")
    log("line two")
    text = (tmp_path / "log.txt").read_text()
    assert text.startswith("hello\n")
    assert "line one\n" in text and "line two\n" in text
    out = capsys.readouterr().out
    assert "line one" in out and "line two" in out
