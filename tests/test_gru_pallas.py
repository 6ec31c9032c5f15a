"""Fused Pallas GRU vs the lax.scan reference implementation: forward parity,
gradient parity (custom VJP), both directions, chunk-boundary shapes, and the
full BiGRU module swap (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalsignal_tpu.models.gru import BiGRU, gru_sequence
from multimodalsignal_tpu.ops.gru_pallas import T_BLK, gru_sequence_pallas


def _setup(rng, b=4, t=None, h=8):
    t = t if t is not None else 2 * T_BLK + 7  # exercises partial last chunk
    three_h = 3 * h
    x_gates = jnp.asarray(rng.standard_normal((b, t, three_h)), jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((three_h, h)) * 0.3, jnp.float32)
    b_hh = jnp.asarray(rng.standard_normal(three_h) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.float32)
    return x_gates, w_hh, b_hh, h0


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_parity(rng, reverse):
    x_gates, w_hh, b_hh, h0 = _setup(rng)
    want = gru_sequence(x_gates, w_hh, b_hh, h0, reverse=reverse)
    got = gru_sequence_pallas(x_gates, w_hh, b_hh, h0, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t", [
    1, 5, T_BLK + 1,
    # Exact-block and multi-chunk shapes move to the slow tier: T_BLK+1
    # already exercises the partial-last-chunk path quick, and
    # test_forward_parity's 2*T_BLK+7 default covers multi-chunk.
    pytest.param(T_BLK, marks=pytest.mark.slow),
    pytest.param(3 * T_BLK, marks=pytest.mark.slow),
])
def test_forward_parity_chunk_boundaries(rng, t):
    x_gates, w_hh, b_hh, h0 = _setup(rng, t=t)
    for reverse in (False, True):
        want = gru_sequence(x_gates, w_hh, b_hh, h0, reverse=reverse)
        got = gru_sequence_pallas(x_gates, w_hh, b_hh, h0, reverse=reverse)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("reverse", [
    False, pytest.param(True, marks=pytest.mark.slow),
])
def test_gradient_parity(rng, reverse):
    """Custom-VJP backward vs autodiff through the scan implementation,
    for every differentiable input. b=2 keeps the interpret-mode quick
    case fast; batch handling is shape-uniform in the kernel."""
    x_gates, w_hh, b_hh, h0 = _setup(rng, b=2, t=T_BLK + 9)
    # Non-uniform cotangent: weight the loss per element.
    w_loss = jnp.asarray(rng.standard_normal(
        (x_gates.shape[0], x_gates.shape[1], w_hh.shape[1])), jnp.float32)

    def loss_scan(xg, whh, bhh, h0):
        return jnp.sum(gru_sequence(xg, whh, bhh, h0, reverse=reverse) * w_loss)

    def loss_pallas(xg, whh, bhh, h0):
        return jnp.sum(
            gru_sequence_pallas(xg, whh, bhh, h0, reverse=reverse) * w_loss
        )

    want = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(x_gates, w_hh, b_hh, h0)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x_gates, w_hh, b_hh, h0)
    for g, w, name in zip(got, want, ("dx_gates", "dw_hh", "db_hh", "dh0")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient mismatch: {name}",
        )


def test_bigru_module_impl_swap(rng):
    """BiGRU(impl='pallas') must match BiGRU(impl='scan') exactly given the
    same params (2 layers, both directions, through the module plumbing).
    Short sequence on purpose: chunk-boundary coverage lives in
    test_forward_parity_chunk_boundaries; this test is about the module
    plumbing, and interpret-mode cost scales with T."""
    x = jnp.asarray(rng.standard_normal((2, T_BLK // 4, 6)), jnp.float32)
    scan_mod = BiGRU(hidden_size=8, num_layers=2, impl="scan")
    pallas_mod = BiGRU(hidden_size=8, num_layers=2, impl="pallas")
    variables = scan_mod.init(jax.random.PRNGKey(0), x)
    want = scan_mod.apply(variables, x)
    got = pallas_mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_bigru_pallas_grad_through_module(rng):
    """Gradient parity THROUGH the module plumbing — slow tier: the kernel
    VJP itself is covered quick by test_gradient_parity[False], and
    model-level grads by test_models.py::test_grads_flow."""
    x = jnp.asarray(rng.standard_normal((2, T_BLK + 3, 4)), jnp.float32)
    mod_s = BiGRU(hidden_size=8, num_layers=1, impl="scan")
    mod_p = BiGRU(hidden_size=8, num_layers=1, impl="pallas")
    variables = mod_s.init(jax.random.PRNGKey(1), x)

    def loss(variables, mod):
        return jnp.sum(mod.apply(variables, x) ** 2)

    g_want = jax.grad(loss)(variables, mod_s)
    g_got = jax.grad(loss)(variables, mod_p)
    flat_w, _ = jax.tree_util.tree_flatten(g_want)
    flat_g, _ = jax.tree_util.tree_flatten(g_got)
    for gw, gg in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=2e-4)


def _vmap_setup(rng):
    f, b, t, h = 3, 2, 40, 4
    xg = jnp.asarray(rng.standard_normal((f, b, t, 3 * h)), jnp.float32)
    whh = jnp.asarray(rng.standard_normal((f, 3 * h, h)) * 0.3, jnp.float32)
    bhh = jnp.asarray(rng.standard_normal((f, 3 * h)) * 0.1, jnp.float32)
    h0 = jnp.zeros((f, b, h), jnp.float32)
    return xg, whh, bhh, h0


def test_vmap_composition(rng):
    """The fold sweep vmaps the model over folds — the kernel must compose
    with vmap (batched grid) and stay parity with scan."""
    xg, whh, bhh, h0 = _vmap_setup(rng)
    want = jax.vmap(lambda a, w, c, d: gru_sequence(a, w, c, d))(xg, whh, bhh, h0)
    got = jax.vmap(lambda a, w, c, d: gru_sequence_pallas(a, w, c, d))(xg, whh, bhh, h0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_vmap_composition_grads(rng):
    """Gradients through the vmapped kernel (slow tier: the custom-VJP fb
    routing is covered quick by test_fold_batched_vs_unbatched)."""
    xg, whh, bhh, h0 = _vmap_setup(rng)

    def loss(fn, w):
        return jnp.sum(jax.vmap(lambda a, ww, c, d: fn(a, ww, c, d))(xg, w, bhh, h0) ** 2)

    g_want = jax.grad(lambda w: loss(gru_sequence, w))(whh)
    g_got = jax.grad(lambda w: loss(gru_sequence_pallas, w))(whh)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bidirectional_parity(rng):
    """The fused two-direction kernel must match per-direction scan results
    (forward and gradients) exactly."""
    from multimodalsignal_tpu.ops.gru_pallas import gru_bidirectional_pallas

    b, t, h = 3, T_BLK + 11, 8
    xg_f = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
    xg_b = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
    whf = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.3, jnp.float32)
    whb = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.3, jnp.float32)
    bhf = jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32)
    bhb = jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32)
    h0 = jnp.zeros((b, h), jnp.float32)

    want_f = gru_sequence(xg_f, whf, bhf, h0, reverse=False)
    want_b = gru_sequence(xg_b, whb, bhb, h0, reverse=True)
    got_f, got_b = gru_bidirectional_pallas(xg_f, xg_b, whf, whb, bhf, bhb, h0)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(args):
        whf, whb, bhf, bhb, xf, xb = args
        yf, yb = gru_bidirectional_pallas(xf, xb, whf, whb, bhf, bhb, h0)
        return jnp.sum(yf ** 2) + jnp.sum(yb ** 3)

    def loss_scan(args):
        whf, whb, bhf, bhb, xf, xb = args
        yf = gru_sequence(xf, whf, bhf, h0, reverse=False)
        yb = gru_sequence(xb, whb, bhb, h0, reverse=True)
        return jnp.sum(yf ** 2) + jnp.sum(yb ** 3)

    args = (whf, whb, bhf, bhb, xg_f, xg_b)
    g_want = jax.grad(loss_scan)(args)
    g_got = jax.grad(loss_fused)(args)
    for gw, gg, name in zip(g_want, g_got,
                            ("whf", "whb", "bhf", "bhb", "xf", "xb")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_dirbatch_bidirectional_parity(rng):
    """The direction-batched path (F=2 lanes of the fold-batched kernels)
    must match per-direction scan results, forward and gradients."""
    from multimodalsignal_tpu.ops.gru_pallas import gru_bidirectional_dirbatch

    b, t, h = 3, T_BLK + 11, 8
    xg_f = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
    xg_b = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
    whf = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.3, jnp.float32)
    whb = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.3, jnp.float32)
    bhf = jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32)
    bhb = jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32)
    h0 = jnp.zeros((b, h), jnp.float32)

    want_f = jax.jit(lambda a, w, c: gru_sequence(a, w, c, h0, reverse=False))(
        xg_f, whf, bhf)
    want_b = jax.jit(lambda a, w, c: gru_sequence(a, w, c, h0, reverse=True))(
        xg_b, whb, bhb)
    got_f, got_b = jax.jit(gru_bidirectional_dirbatch)(
        xg_f, xg_b, whf, whb, bhf, bhb, h0)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-5)

    def loss_db(args):
        whf, whb, bhf, bhb, xf, xb = args
        yf, yb = gru_bidirectional_dirbatch(xf, xb, whf, whb, bhf, bhb, h0)
        return jnp.sum(yf ** 2) + jnp.sum(yb ** 3)

    def loss_scan(args):
        whf, whb, bhf, bhb, xf, xb = args
        yf = gru_sequence(xf, whf, bhf, h0, reverse=False)
        yb = gru_sequence(xb, whb, bhb, h0, reverse=True)
        return jnp.sum(yf ** 2) + jnp.sum(yb ** 3)

    args = (whf, whb, bhf, bhb, xg_f, xg_b)
    g_want = jax.jit(jax.grad(loss_scan))(args)
    g_got = jax.jit(jax.grad(loss_db))(args)
    for gw, gg, name in zip(g_want, g_got,
                            ("whf", "whb", "bhf", "bhb", "xf", "xb")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_dirbatch_bigru_module(rng):
    """BiGRU(impl='pallas_db') matches impl='scan' through the module
    plumbing (2 layers, both directions, shared params)."""
    x = jnp.asarray(rng.standard_normal((2, T_BLK // 4, 6)), jnp.float32)
    scan_mod = BiGRU(hidden_size=8, num_layers=2, impl="scan")
    db_mod = BiGRU(hidden_size=8, num_layers=2, impl="pallas_db")
    variables = scan_mod.init(jax.random.PRNGKey(0), x)
    want = jax.jit(scan_mod.apply)(variables, x)
    got = jax.jit(db_mod.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dirbatch_under_fold_vmap(rng):
    """The fold sweep vmaps the model over folds; with impl='pallas_db' the
    direction vmap nests inside the fold vmap. The fb-level custom_vmap must
    collapse both into one fold axis (not fall into batched-grid lowering)
    and stay parity with scan — forward and gradients."""
    from multimodalsignal_tpu.ops.gru_pallas import gru_bidirectional_dirbatch

    f, b, t, h = 3, 2, 40, 4
    shp = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa: E731
    xg_f, xg_b = shp(f, b, t, 3 * h), shp(f, b, t, 3 * h)
    whf, whb = shp(f, 3 * h, h) * 0.3, shp(f, 3 * h, h) * 0.3
    bhf, bhb = shp(f, 3 * h) * 0.1, shp(f, 3 * h) * 0.1
    h0 = jnp.zeros((f, b, h), jnp.float32)

    def db(xf, xb, wf, wb, bf, bb, h00):
        yf, yb = gru_bidirectional_dirbatch(xf, xb, wf, wb, bf, bb, h00)
        return yf, yb

    def scan2(xf, xb, wf, wb, bf, bb, h00):
        return (gru_sequence(xf, wf, bf, h00, reverse=False),
                gru_sequence(xb, wb, bb, h00, reverse=True))

    args = (xg_f, xg_b, whf, whb, bhf, bhb, h0)
    want_f, want_b = jax.vmap(scan2)(*args)
    got_f, got_b = jax.vmap(db)(*args)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, wf):
        yf, yb = jax.vmap(fn)(xg_f, xg_b, wf, whb, bhf, bhb, h0)
        return jnp.sum(yf ** 2) + jnp.sum(yb ** 3)

    g_want = jax.grad(lambda w: loss(scan2, w))(whf)
    g_got = jax.grad(lambda w: loss(db, w))(whf)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=2e-4, atol=2e-4)


# --- fold-batched kernels (custom_vmap interception) -----------------------

def _fb_setup(rng, f=3, b=2, t=None, h=4):
    # Small B/H on purpose: interpret-mode cost scales with the per-step
    # working set and these tests assert parity, not capacity.
    t = t if t is not None else 2 * T_BLK + 7
    xg = jnp.asarray(rng.standard_normal((f, b, t, 3 * h)), jnp.float32)
    whh = jnp.asarray(rng.standard_normal((f, 3 * h, h)) * 0.3, jnp.float32)
    bhh = jnp.asarray(rng.standard_normal((f, 3 * h)) * 0.1, jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((f, b, h)) * 0.5, jnp.float32)
    return xg, whh, bhh, h0


def _fb_parity(rng, f, reverse, group, monkeypatch, with_grads=True):
    """vmap over folds routes into the fold-batched kernels (custom_vmap);
    forward (and optionally custom-VJP gradients) must match the unbatched
    kernel per fold. Fold GROUPING is opt-in (off by default — an end-to-end
    negative result, benchmarks/RESULTS.md round 2); grouped cases enable it
    via MMS_GRU_FOLD_GROUP. F=5 has no divisor <= 4 and stays ungrouped —
    BIT-exact. Grouped sizes add zero-block lanes to the MXU contraction,
    so their parity is to f32 round-off."""
    if group:
        monkeypatch.setenv("MMS_GRU_FOLD_GROUP", "4")
    else:
        monkeypatch.delenv("MMS_GRU_FOLD_GROUP", raising=False)
    xg, whh, bhh, h0 = _fb_setup(rng, f=f, t=T_BLK + 5)
    from multimodalsignal_tpu.ops.gru_pallas import _pick_group
    exact = _pick_group(f) == 1

    def run(a, w, c, d):
        return gru_sequence_pallas(a, w, c, d, reverse=reverse)

    def check(got, want):
        if exact:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-5)

    got = jax.jit(jax.vmap(run))(xg, whh, bhh, h0)
    want = np.stack([np.asarray(run(xg[i], whh[i], bhh[i], h0[i]))
                     for i in range(f)])
    check(got, want)

    if not with_grads:
        return

    def loss(a, w, c, d):
        return jnp.sum(run(a, w, c, d) ** 2)

    g_fb = jax.jit(jax.vmap(jax.grad(loss, argnums=(0, 1, 2, 3))))(
        xg, whh, bhh, h0
    )
    g_single = [jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        xg[i], whh[i], bhh[i], h0[i]) for i in range(f)]
    for j in range(4):
        want_j = np.stack([np.asarray(g_single[i][j]) for i in range(f)])
        check(g_fb[j], want_j)


def test_fold_batched_forward_smoke(rng, monkeypatch):
    """Quick tier: forward-only fb routing parity on the production default
    (grouping off) — interpret-mode VJP costs live in the slow tier."""
    _fb_parity(rng, f=2, reverse=True, group=False, monkeypatch=monkeypatch,
               with_grads=False)


@pytest.mark.slow
@pytest.mark.parametrize("f,reverse,group", [
    (2, True, False),    # grouping OFF (the production default), with grads
    (5, True, True),     # ungrouped G=1
    (4, False, True),    # one G=4 block
    (8, True, True),     # TWO G=4 blocks
    (3, True, True),     # G=3 divisor path
    (5, False, True),
    (4, True, True),
])
def test_fold_batched_vs_unbatched(rng, f, reverse, group, monkeypatch):
    _fb_parity(rng, f, reverse, group, monkeypatch, with_grads=True)


def test_fold_batched_partial_batching(rng):
    """Shared (unbatched) weights under vmap broadcast into the fold axis."""
    xg, whh, bhh, h0 = _fb_setup(rng)
    w0, b0 = whh[0], bhh[0]

    got = jax.jit(jax.vmap(
        lambda a, d: gru_sequence_pallas(a, w0, b0, d), in_axes=(0, 0)
    ))(xg, h0)
    want = jax.vmap(lambda a, d: gru_sequence(a, w0, b0, d))(xg, h0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# --- bf16 kernel mode ------------------------------------------------------

def test_bf16_fold_batched_forward(rng):
    """vmapped bf16 calls route NATIVELY into the fold-batched kernels (no
    f32 round-trip — VERDICT r2 weak #1): the vmapped bf16 forward must
    track the vmapped f32 fb kernels within bf16 round-off, and the bf16
    output dtype must survive the vmap rule."""
    xg, whh, bhh, h0 = _fb_setup(rng, f=2, t=T_BLK // 2 + 5)
    to16 = lambda a: a.astype(jnp.bfloat16)  # noqa: E731

    def run(a, w, c, d):
        return gru_sequence_pallas(a, w, c, d, reverse=True)

    want = jax.jit(jax.vmap(run))(xg, whh, bhh, h0)
    got = jax.jit(jax.vmap(run))(to16(xg), to16(whh), to16(bhh), h0)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.0, atol=0.05)


@pytest.mark.slow
def test_bf16_fold_batched_close_to_f32_fb(rng):
    """bf16 fb custom-VJP gradients track the f32 fb kernels within bf16
    round-off, with the right cotangent dtypes (slow tier: interpret-mode
    VJP; the forward + dtype contract is quick in
    test_bf16_fold_batched_forward)."""
    f = 2
    xg, whh, bhh, h0 = _fb_setup(rng, f=f, t=T_BLK // 2 + 5)
    to16 = lambda a: a.astype(jnp.bfloat16)  # noqa: E731

    def run(a, w, c, d):
        return gru_sequence_pallas(a, w, c, d, reverse=True)

    def loss(a, w, c, d):
        return jnp.sum(run(a, w, c, d).astype(jnp.float32) ** 2)

    want_g = jax.jit(jax.vmap(jax.grad(loss, argnums=(0, 1, 2, 3))))(
        xg, whh, bhh, h0)
    got_g = jax.jit(jax.vmap(jax.grad(loss, argnums=(0, 1, 2, 3))))(
        to16(xg), to16(whh), to16(bhh), h0)
    assert got_g[0].dtype == jnp.bfloat16
    assert got_g[1].dtype == jnp.bfloat16
    assert got_g[3].dtype == jnp.float32  # h0 is always carried f32
    for g, w, name, tol in zip(
        got_g, want_g, ("dx_gates", "dw_hh", "db_hh", "dh0"),
        (0.15, 0.5, 0.5, 0.15),
    ):
        scale = float(np.abs(np.asarray(w, np.float32)).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(g, np.float32) / scale,
            np.asarray(w, np.float32) / scale,
            rtol=0.0, atol=tol / scale if scale > 1 else tol,
            err_msg=f"bf16 fb gradient diverged: {name}",
        )


def test_bf16_forward_close_to_f32(rng):
    """bf16 inputs select the kernels' bf16 mode (bf16 streams/MXU operands,
    f32 carry). The forward output must track the f32 kernel within bf16
    round-off and keep the bf16 dtype."""
    x_gates, w_hh, b_hh, h0 = _setup(rng, b=2, t=T_BLK + 9)
    want_y = gru_sequence_pallas(x_gates, w_hh, b_hh, h0, reverse=False)
    got_y = gru_sequence_pallas(
        x_gates.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16),
        b_hh.astype(jnp.bfloat16), h0, reverse=False,
    )
    assert got_y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_y, np.float32), np.asarray(want_y),
        rtol=0.0, atol=0.05,
    )


@pytest.mark.slow
@pytest.mark.parametrize("reverse", [False, True])
def test_bf16_forward_and_grads_close_to_f32(rng, reverse):
    """bf16 gradients (f32 dW/db accumulators) must track the f32 kernel
    within bf16 round-off, and cotangent dtypes must match the bf16 primals
    (slow tier: interpret-mode VJP; the forward contract is quick in
    test_bf16_forward_close_to_f32)."""
    x_gates, w_hh, b_hh, h0 = _setup(rng, b=2, t=T_BLK + 9)

    want_y = gru_sequence_pallas(x_gates, w_hh, b_hh, h0, reverse=reverse)
    got_y = gru_sequence_pallas(
        x_gates.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16),
        b_hh.astype(jnp.bfloat16), h0, reverse=reverse,
    )
    assert got_y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_y, np.float32), np.asarray(want_y),
        rtol=0.0, atol=0.05,
    )

    def loss(xg, whh, bhh, h0):
        y = gru_sequence_pallas(xg, whh, bhh, h0, reverse=reverse)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    want_g = jax.grad(loss, argnums=(0, 1, 2, 3))(x_gates, w_hh, b_hh, h0)
    got_g = jax.grad(loss, argnums=(0, 1, 2, 3))(
        x_gates.astype(jnp.bfloat16), w_hh.astype(jnp.bfloat16),
        b_hh.astype(jnp.bfloat16), h0,
    )
    assert got_g[0].dtype == jnp.bfloat16
    assert got_g[1].dtype == jnp.bfloat16
    assert got_g[3].dtype == jnp.float32  # h0 is always carried f32
    for g, w, name, tol in zip(
        got_g, want_g, ("dx_gates", "dw_hh", "db_hh", "dh0"),
        (0.15, 0.5, 0.5, 0.15),
    ):
        scale = float(np.abs(np.asarray(w, np.float32)).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(g, np.float32) / scale,
            np.asarray(w, np.float32) / scale,
            rtol=0.0, atol=tol / scale if scale > 1 else tol,
            err_msg=f"bf16 gradient diverged: {name}",
        )


def test_bf16_bigru_module(rng):
    """BiGRU(dtype=bfloat16, impl=pallas) runs end-to-end and tracks the
    f32 module within bf16 tolerance."""
    x = jnp.asarray(rng.standard_normal((2, T_BLK + 3, 4)), jnp.float32)
    mod32 = BiGRU(hidden_size=8, num_layers=1, impl="pallas")
    mod16 = BiGRU(hidden_size=8, num_layers=1, impl="pallas",
                  dtype=jnp.bfloat16)
    variables = mod32.init(jax.random.PRNGKey(1), x)
    want = mod32.apply(variables, x)
    got = mod16.apply(variables, x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.0, atol=0.1)


def test_fold_chunking_forward(rng, monkeypatch):
    """Fold counts beyond _FB_MAX_FOLDS split into sequential even-sized
    kernel groups (the fixed per-fold VMEM buffers — weights, bias
    broadcast, dW scratch — scale with F and overflow scoped VMEM near
    F~48, observed at 45 seed-replicated lanes). Chunked == unchunked,
    bit-exact."""
    import multimodalsignal_tpu.ops.gru_pallas as gp

    monkeypatch.delenv("MMS_GRU_FOLD_GROUP", raising=False)
    xg, whh, bhh, h0 = _fb_setup(rng, f=5, t=T_BLK // 2 + 3)

    def run(a, w, c, d):
        return gru_sequence_pallas(a, w, c, d, reverse=True)

    want = jax.jit(jax.vmap(run))(xg, whh, bhh, h0)  # one kernel, F=5
    monkeypatch.setattr(gp, "_FB_MAX_FOLDS", 2)
    assert [s.stop - s.start for s in gp._fold_slices(5)] == [1, 2, 2]
    got = jax.jit(jax.vmap(run))(xg, whh, bhh, h0)  # three chunked kernels
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_fold_chunking_grads(rng, monkeypatch):
    """Custom-VJP gradients through the fold-chunked fb path are bit-exact
    vs the single-kernel fb path."""
    import multimodalsignal_tpu.ops.gru_pallas as gp

    monkeypatch.delenv("MMS_GRU_FOLD_GROUP", raising=False)
    xg, whh, bhh, h0 = _fb_setup(rng, f=5, t=T_BLK // 2 + 3)

    def loss(a, w, c, d):
        return jnp.sum(gru_sequence_pallas(a, w, c, d, reverse=False) ** 2)

    grad_fn = jax.jit(jax.vmap(jax.grad(loss, argnums=(0, 1, 2, 3))))
    want = grad_fn(xg, whh, bhh, h0)
    monkeypatch.setattr(gp, "_FB_MAX_FOLDS", 2)
    got = jax.jit(jax.vmap(jax.grad(loss, argnums=(0, 1, 2, 3))))(
        xg, whh, bhh, h0
    )
    for j in range(4):
        # ulp-level tolerance: slicing changes XLA fusion shapes around the
        # (interpret-mode) kernels, which can reorder f32 contractions.
        np.testing.assert_allclose(np.asarray(got[j]), np.asarray(want[j]),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("impl", ["pallas", "pallas_db"])
def test_bigru_last_only_through_pallas(rng, impl):
    """BiGRU(last_only=True) with the kernel impls: the final layer's forward
    walk routes through gru_sequence_pallas and the pruned backward direction
    is a single plain-jnp cell step — output must match the scan full-walk
    last timestep (interpret mode on CPU)."""
    x = jnp.asarray(rng.standard_normal((2, T_BLK // 4, 6)), jnp.float32)
    scan_full = BiGRU(hidden_size=8, num_layers=2, impl="scan")
    pruned = BiGRU(hidden_size=8, num_layers=2, impl=impl, last_only=True)
    variables = scan_full.init(jax.random.PRNGKey(0), x)
    want = scan_full.apply(variables, x)[:, -1, :]
    got = pruned.apply(variables, x)
    assert got.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
