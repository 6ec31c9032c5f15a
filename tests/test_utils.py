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


def test_tee_logger_append_preserves_log(tmp_path):
    """A resumed Trainer must not truncate the pre-resume epochs."""
    path = tmp_path / "log.txt"
    log = TeeLogger(path, header="run 1")
    log("epoch 1")
    log2 = TeeLogger(path, header="resumed", append=True)
    log2("epoch 2")
    text = path.read_text()
    assert "epoch 1" in text and "epoch 2" in text and "resumed" in text


def test_tee_logger_append_fresh_file(tmp_path):
    path = tmp_path / "log.txt"
    TeeLogger(path, header="hello", append=True)
    assert path.read_text().startswith("hello\n")


def test_make_run_dir_honors_mms_run_id(tmp_path, monkeypatch):
    """Multi-host launches set MMS_RUN_ID so every process computes the
    same run directory (parallel/multihost.py)."""
    monkeypatch.setenv("MMS_NUM_PROCESSES", "2")
    monkeypatch.setenv("MMS_RUN_ID", "podjob7")
    a = make_run_dir(tmp_path, "exp")
    b = make_run_dir(tmp_path, "exp")
    assert a == b == tmp_path / "exp" / "run_podjob7"
    # A stale MMS_RUN_ID without the multi-host env must NOT reuse the dir.
    monkeypatch.delenv("MMS_NUM_PROCESSES")
    c = make_run_dir(tmp_path, "exp")
    assert c.name.startswith("run_") and c != a
    monkeypatch.delenv("MMS_RUN_ID")
    d = make_run_dir(tmp_path, "exp")
    assert d != a
