"""Roofline / MFU analysis of the flagship train step (VERDICT r3 item #6).

Answers, with arithmetic instead of vibes: how many FLOPs is one train step,
what fraction of the chip's MXU the measured steps/s corresponds to, and why
further kernel work on the recurrence is latency-bound rather than compute-
or bandwidth-bound.

FLOPs are counted ANALYTICALLY from the architecture shapes (2*MACs),
schedule-exactly for the shipped training path (pallas_db custom-VJP
kernels + gru_last_prune): the backward recurrence recomputes the hidden
gates (one extra walk) and accumulates dW per step, so it costs ~3x the
forward walk, and the final layer's backward-direction walk is pruned to
one cell step in both passes. XLA's compiled-program cost model is NOT used:
it counts while-loop bodies ONCE (verified: a 480-iteration scan of a
64x64x64 matmul reports 2*64^3 flops), so it undercounts recurrent programs
by ~the sequence length.

Run anywhere (the count is platform-independent):

    python benchmarks/roofline.py [--batch 64] [--channels 3] [--seq 7680]
        [--steps-per-sec 600.6] [--peak-tflops 197]

steps-per-sec defaults to BENCH_r03's measured 600.6 (bf16, pallas_db,
B=64/C=3/T=7680 on one v5e); peak-tflops to the v5e bf16 MXU peak.
"""

from __future__ import annotations

import argparse
import functools
import json

print = functools.partial(print, flush=True)


def flop_breakdown(b: int, c: int, t: int, cnn1: int = 16, cnn2: int = 32,
                   h: int = 64, layers: int = 2, classes: int = 2,
                   last_prune: bool = True) -> tuple[dict, dict, int]:
    """(forward components, train-step components, gru_seq_len).

    Forward = 2*MACs per op. Train step multipliers, matching the shipped
    schedule (ops/gru_pallas.py custom VJP; models/gru.py last_only prune):
      * convs / projections / head: x3 (fwd + dInput + dWeight matmuls)
      * recurrent walks: x4 (fwd walk + backward's gate recompute walk +
        dgates->dh walk + per-step dW accumulation, each the same
        [B,H]x[H,3H]-per-step cost)
      * last_prune: the final layer's backward-direction walk and its
        input projection run for ONE step instead of T' in both passes.
    Adam/BN/dropout/attention are O(params + B*C*T) adds — negligible and
    counted in 'other (elementwise)'.
    """
    t1 = t // 2            # conv1 stride 2
    t1p = t1 // 2          # pool  stride 2
    t2 = t1p // 2          # conv2 stride 2
    t2p = t2 // 2          # pool  stride 2 -> GRU length (480 at t=7680)

    fwd: dict[str, float] = {}
    step: dict[str, float] = {}

    conv = 2 * b * t1 * cnn1 * c * 7 + 2 * b * t2 * cnn2 * cnn1 * 5
    fwd["convs (k7s2 + k5s2)"] = conv
    step["convs (k7s2 + k5s2)"] = 3 * conv

    proj_fwd = proj_step = 0.0
    rec_fwd = rec_step = 0.0
    walk_proj = lambda f_in, steps: 2 * b * steps * f_in * 3 * h  # noqa: E731
    walk_rec = lambda steps: 2 * b * steps * h * 3 * h            # noqa: E731
    for layer in range(layers):
        f_in = cnn2 if layer == 0 else 2 * h
        pruned = last_prune and layer == layers - 1
        for _direction in range(2):
            bwd_dir = _direction == 1
            steps = 1 if (pruned and bwd_dir) else t2p
            proj_fwd += walk_proj(f_in, steps)
            proj_step += 3 * walk_proj(f_in, steps)
            rec_fwd += walk_rec(steps)
            rec_step += 4 * walk_rec(steps)
    fwd["gru input projections"] = proj_fwd
    step["gru input projections"] = proj_step
    fwd["gru recurrent walks"] = rec_fwd
    step["gru recurrent walks"] = rec_step

    head = 2 * b * (2 * h * 64 + 64 * classes)
    fwd["head (2H->64->cls)"] = head
    step["head (2H->64->cls)"] = 3 * head

    # Elementwise tail: attention gate, BN, activations, Adam (~10 flops
    # per param), losses. Orders of magnitude below the matmuls.
    ew = 4 * b * c * t + 20 * b * t2p * h + 10 * 110_000
    fwd["other (elementwise)"] = ew
    step["other (elementwise)"] = 3 * ew
    return fwd, step, t2p


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--seq", type=int, default=7680)
    p.add_argument("--steps-per-sec", type=float, default=600.6,
                   help="measured train steps/s (BENCH_r03 default)")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="chip MXU peak for the bench dtype (v5e bf16)")
    p.add_argument("--walk-us", type=float, default=751.0,
                   help="measured single-direction f32 Pallas walk at "
                        "[B=64,T=480,H=64] (precision-probe measurement)")
    p.add_argument("--no-last-prune", action="store_true")
    args = p.parse_args()

    fwd, step, t2p = flop_breakdown(args.batch, args.channels, args.seq,
                                    last_prune=not args.no_last_prune)
    fwd_total = sum(fwd.values())
    step_total = sum(step.values())
    print("FLOPs by component (forward | full train step):")
    for name in fwd:
        print(f"  {name:26s} {fwd[name] / 1e9:8.3f} | "
              f"{step[name] / 1e9:8.3f} GFLOP "
              f"({100 * step[name] / step_total:5.1f}% of step)")
    print(f"  {'TOTAL':26s} {fwd_total / 1e9:8.3f} | "
          f"{step_total / 1e9:8.3f} GFLOP")

    achieved = step_total * args.steps_per_sec
    mfu = achieved / (args.peak_tflops * 1e12)
    print(f"\nAt {args.steps_per_sec} steps/s: "
          f"{achieved / 1e12:.2f} TFLOP/s achieved = "
          f"{100 * mfu:.2f}% of the {args.peak_tflops} TFLOP/s MXU peak")

    # Latency-floor arithmetic: sequential cell steps per train step under
    # the shipped schedule (pallas_db: both directions ride ONE walk; the
    # pruned final layer runs fwd-direction only + 1 cell), mirrored by the
    # adjoint. Without the prune, the final layer's backward direction rides
    # the direction-batched walk (same T' wall), so the walk count per pass
    # is 2 either way — the prune removes the +1 cell and the lone-direction
    # walk's second lane, not a walk.
    if args.no_last_prune:
        seq_steps = 2 * (2 * t2p)
    else:
        seq_steps = 2 * (2 * t2p + 1)
    step_ms = 1e3 / args.steps_per_sec
    per_cell_us = step_ms * 1e3 / seq_steps
    walk_cell_us = args.walk_us / t2p
    print(f"\nLatency floor: {seq_steps} sequential recurrence steps per "
          f"train step (layer walks of {t2p}, fwd+adjoint, last-prune); "
          f"measured {step_ms:.2f} ms/step -> {per_cell_us:.2f} us per "
          f"sequential step INCLUDING convs/head/optimizer.")
    print(f"Isolated kernel walk: {args.walk_us:.0f} us / {t2p} steps = "
          f"{walk_cell_us:.2f} us per cell step (f32, single direction) — "
          f"the train step already runs BELOW the isolated-walk rate "
          f"(direction batching + bf16), i.e. the walk IS the clock.")
    print(json.dumps({
        "metric": "flagship MFU", "value": round(100 * mfu, 3), "unit": "%",
        "flops_per_step": step_total, "steps_per_sec": args.steps_per_sec,
        "sequential_cell_steps": seq_steps,
        "us_per_sequential_step": round(per_cell_us, 3),
    }))


if __name__ == "__main__":
    main()
