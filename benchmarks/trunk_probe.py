"""Probe: where does the conv-trunk time go, and can a reformulation win?

RESULTS.md's step decomposition charges ~0.35 ms of the 2.145 ms bf16 train
step to the conv trunk (2x conv/BN/ReLU/pool) and estimates a fused kernel
could recover ~0.3 ms. Before writing that kernel, this probe times the
trunk standalone (fwd and fwd+bwd, train-mode BN) against candidate
reformulations at the flagship shape, using the same scan-of-steps timing
harness as bench.py so remote-dispatch latency never pollutes the numbers.

Variants:
  xla      — the shipped flax ConvEncoder (XLA conv_general_dilated lowering)
  unfold   — convs rewritten as unfold(strided-slice concat) + single matmul,
             pools kept as reduce_window (the round-3 lesson: strided-slice
             max breaks XLA's pool fusion)
  patches  — convs via lax.conv_general_dilated_patches + matmul

Run: python benchmarks/trunk_probe.py [--steps 200] [--fwd-only]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class TrunkXLA(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, kernel_size=(7,), strides=(2,), padding=[(3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        x = nn.Conv(32, kernel_size=(5,), strides=(2,), padding=[(2, 2)],
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        return x


def _unfold_conv(x, kernel, k: int, stride: int, pad: int):
    """Conv1d as an unfold (concat of k strided slices) + one matmul.

    x: [B, T, C]; kernel: [k, C, O] (flax Conv layout). Output [B, T', O]
    with T' = (T + 2*pad - k) // stride + 1, exactly matching XLA's conv.
    """
    b, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t_out = (t + 2 * pad - k) // stride + 1
    taps = [jax.lax.slice_in_dim(xp, i, i + (t_out - 1) * stride + 1,
                                 stride=stride, axis=1) for i in range(k)]
    windows = jnp.concatenate(taps, axis=-1)  # [B, T', k*C] (tap-major)
    w = kernel.reshape(k * c, -1)  # [k*C, O], same tap-major order
    return jax.lax.dot_general(
        windows, w, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


class TrunkUnfold(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        k1 = self.param("conv1", nn.initializers.lecun_normal(),
                        (7, c_in, 16), jnp.float32).astype(self.dtype)
        x = _unfold_conv(x, k1, 7, 2, 3)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        k2 = self.param("conv2", nn.initializers.lecun_normal(),
                        (5, 16, 32), jnp.float32).astype(self.dtype)
        x = _unfold_conv(x, k2, 5, 2, 2)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        return x


def _patches_conv(x, kernel, k: int, stride: int, pad: int):
    b, t, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (k,), (stride,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"))  # [B, T', C*k] channel-major
    # conv_general_dilated_patches orders features as (C, k); reorder kernel.
    w = jnp.transpose(kernel, (1, 0, 2)).reshape(c * k, -1)
    return jax.lax.dot_general(
        patches, w, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


class TrunkPatches(TrunkUnfold):
    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        k1 = self.param("conv1", nn.initializers.lecun_normal(),
                        (7, c_in, 16), jnp.float32).astype(self.dtype)
        x = _patches_conv(x, k1, 7, 2, 3)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        k2 = self.param("conv2", nn.initializers.lecun_normal(),
                        (5, 16, 32), jnp.float32).astype(self.dtype)
        x = _patches_conv(x, k2, 5, 2, 2)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(2,), padding=[(1, 1)])
        return x


VARIANTS = {"xla": TrunkXLA, "unfold": TrunkUnfold, "patches": TrunkPatches}


def time_variant(name: str, batch: int, seq: int, channels: int, steps: int,
                 train: bool) -> float:
    model = VARIANTS[name]()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, seq, channels), jnp.bfloat16)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if train:
        def one(carry, _):
            p, bs = carry

            def loss_fn(p):
                y, new = model.apply({"params": p, "batch_stats": bs}, x,
                                     train=True, mutable=["batch_stats"])
                return (jnp.sum(y.astype(jnp.float32)),
                        new.get("batch_stats", {}))

            (loss, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p2 = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
            return (p2, bs2), loss
        carry0 = (params, batch_stats)
    else:
        def one(carry, _):
            y = model.apply({"params": carry, "batch_stats": batch_stats},
                            x, train=False)
            p2 = jax.tree.map(
                lambda a: a + 1e-9 * jnp.sum(y.astype(jnp.float32)), carry)
            return p2, jnp.sum(y.astype(jnp.float32))
        carry0 = params

    @jax.jit
    def run(carry):
        return jax.lax.scan(one, carry, jnp.arange(steps))

    carry, loss = run(carry0)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    carry, loss = run(carry)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / steps


def check_parity(batch=4, seq=512, channels=3):
    """All variants must agree on the forward pass given identical weights."""
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (batch, seq, channels), jnp.float32)
    ref = TrunkXLA(dtype=jnp.float32)
    vref = ref.init(rng, x, train=False)
    yref = jax.jit(functools.partial(ref.apply, train=False))(vref, x)
    for name in ("unfold", "patches"):
        m = VARIANTS[name](dtype=jnp.float32)
        v = m.init(rng, x, train=False)
        # Graft the flax conv kernels into the matmul params.
        params = dict(v["params"])
        params["conv1"] = vref["params"]["conv1"]["kernel"]
        params["conv2"] = vref["params"]["conv2"]["kernel"]
        y = jax.jit(functools.partial(m.apply, train=False))(
            {"params": params, "batch_stats": vref["batch_stats"]}, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                                   rtol=2e-5, atol=2e-5)
    print("parity ok (fwd, f32, all variants)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=7680)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--stage-decomp", action="store_true",
                    help="time cumulative trunk prefixes instead of variants")
    args = ap.parse_args()

    if args.stage_decomp:
        stage_decomposition(args.batch, args.seq, args.channels, args.steps)
        return
    if not args.skip_parity:
        check_parity()
    for name in VARIANTS:
        dt = time_variant(name, args.batch, args.seq, args.channels,
                          args.steps, train=not args.fwd_only)
        mode = "fwd" if args.fwd_only else "fwd+bwd+bn"
        print(f"{name:8s} {mode}: {dt * 1e6:8.1f} us/step")




class TrunkPrefix(nn.Module):
    """First `stages` ops of the trunk, for stage-by-stage attribution."""
    stages: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stages
        x = nn.Conv(16, kernel_size=(7,), strides=(2,), padding=[(3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        if s >= 2:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        if s >= 3:
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(3,), strides=(2,),
                            padding=[(1, 1)])
        if s >= 4:
            x = nn.Conv(32, kernel_size=(5,), strides=(2,),
                        padding=[(2, 2)], use_bias=False, dtype=self.dtype,
                        name="conv2")(x)
        if s >= 5:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        if s >= 6:
            x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(3,), strides=(2,),
                            padding=[(1, 1)])
        return x


def stage_decomposition(batch=64, seq=7680, channels=3, steps=200):
    names = ["conv1", "+bn1", "+relu+pool1", "+conv2", "+bn2", "+relu+pool2"]
    prev = 0.0
    for s, label in enumerate(names, start=1):
        VARIANTS["prefix"] = functools.partial(TrunkPrefix, stages=s)
        dt = time_variant("prefix", batch, seq, channels, steps, train=True)
        print(f"stage {s} ({label:12s}): cumulative {dt*1e6:7.1f} us/step "
              f"(delta {(dt - prev)*1e6:+7.1f})", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
