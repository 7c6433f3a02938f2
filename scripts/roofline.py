"""Speed-of-light (roofline) analysis of the fused cluster-attention
call sites in an AFF forward pass.

Host-only (CPU trace, no chip): hooks ``_attention_fwd_impl`` to record
each call site's kernel geometry (path, window width, tile, group size),
then charges the kernel's ACTUAL algorithm — dense masked (tq, W) logits
on the MXU, VPU softmax planes, resident-K/V HBM traffic — against v5e
peak rates. This bounds what any further kernel tuning can recover per
stage, separating "kernel is near its own light speed" from "kernel does
avoidable work" (the windowed design trades ~W/m extra MXU flops for
gather-free execution; the roofline shows both the design's bound and
the ideal-gather bound).

Reference for the measured column: PERF.md per-stage profile
(mini b128: stage1 2x5.07 ms, stage2 2x3.07, stage3 6x1.0).

Usage: python scripts/roofline.py [mini|small] [batch]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peaks (public: 197 bf16 TFLOP/s, 819 GB/s HBM). VPU: 8-wide f32
# ALUs x (8, 128) vregs at ~0.94 GHz ~= 3.9e12 f32 op/s; transcendentals
# (exp) cost ~4 slots.
MXU_FLOPS = 197e12
HBM_BPS = 819e9
VPU_FLOPS = 3.9e12

PRESETS = {
    "mini": dict(embed_dim=(32, 128, 256, 384), num_heads=(2, 4, 8, 16),
                 depths=(2, 2, 6, 2), mlp_ratio=2.0, cluster_size=8,
                 nbhd_size=(48, 48, 48, 49)),
    "small": dict(embed_dim=(96, 192, 384, 768), num_heads=(3, 6, 12, 24),
                  depths=(2, 2, 18, 2), mlp_ratio=3.0, cluster_size=8,
                  nbhd_size=(48, 48, 48, 49)),
}

MEASURED_MS = {  # PERF.md on-chip profiles (b128)
    ("mini", 3136): 5.07, ("mini", 784): 3.07, ("mini", 196): 1.0,
    ("small", 3136): 7.5, ("small", 784): 4.45, ("small", 196): 1.50,
}


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "mini"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from ml_autofocusformermod_tpu.ops import clusten_pallas as cp
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    calls = []
    orig = cp._attention_fwd_impl

    def spy(q, kv, ncc, pos, pe_kernel, pe_bias, blank_k, blank_v, h, cs,
            rel_width, clamp_width, static_ncc=None):
        b, n, c = q.shape
        kk = -(-n // cs)
        np_ = kk * cs
        tq, window = cp._choose_tiling(n, np_, cs, static_ncc)
        rec = dict(b=b, n=n, c=c, h=h, cs=cs, np_=np_, tq=tq,
                   m=ncc.shape[-1] * cs, static=static_ncc is not None)
        if window is not None and window[0] != "compact":
            nb, Wb, np128, _ = window
            rec.update(path="windowed", W=nb * Wb, np128=np128)
        elif window is not None:
            rec.update(path="compact", W=window[1] * window[2])
        else:
            stacked = (np_ <= 256)
            rec.update(path="stacked" if stacked else "dense", W=np_)
        calls.append(rec)
        # skip the real pallas trace: return a correctly-shaped zero
        return jnp.zeros((b, n, c), q.dtype)

    cp._attention_fwd_impl = spy
    # the model reads this to pick the pallas path
    kw = PRESETS[preset]
    model = AutoFocusFormer(num_classes=1000, img_size=224, use_pallas=True,
                            dtype=jnp.bfloat16, **kw)
    try:
        images = jnp.zeros((batch, 224, 224, 3), jnp.float32)
        var = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), images[:1],
                               training=False)
        )
        var = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), var)
        jax.eval_shape(
            lambda v, im: model.apply(v, im, training=False), var, images)
    finally:
        cp._attention_fwd_impl = orig

    # aggregate per unique geometry; count blocks per stage
    seen = {}
    order = []
    for r in calls:
        if r["b"] != batch:  # drop the model.init trace (b=1)
            continue
        key = (r["n"], r["c"], r["h"], r["path"])
        if key not in seen:
            seen[key] = dict(r, count=0)
            order.append(key)
        seen[key]["count"] += 1

    print(f"# roofline {preset} b{batch} 224^2 — per-CALL bounds (ms)")
    hdr = (f"{'stage':>22} {'blk':>3} {'W':>5} {'MXU':>6} {'VPU':>6} "
           f"{'HBM':>6} {'SOL':>6} {'ideal':>6} {'meas':>6} {'x-SOL':>6}")
    print(hdr)
    tot_sol = tot_meas = tot_ideal = 0.0
    for key in order:
        r = seen[key]
        b, n, c, h, W, m = batch, r["n"], r["c"], r["h"], r["W"], r["m"]
        c_ = c // h
        # kernel's actual math: QK (n, c_) @ (c_, W) + AV (n, W) @ (W, c_)
        macs = 2 * b * h * n * W * c_
        mxu = 2 * macs / MXU_FLOPS
        # VPU planes: bias add + mask add + exp(4) + mul + sum(1) + div
        # ~= 9 f32 ops per (n, W) element per head
        vpu = 9 * b * h * n * W / VPU_FLOPS
        # HBM: q + kv (fetched once, resident) + out + f32 pe bias planes
        # (windowed: bias hoisted per kernel instance, batch-invariant)
        bytes_ = b * n * c * 2 * 2 + b * r["np_"] * 2 * c * 2
        hbm = bytes_ / HBM_BPS
        sol = max(mxu, vpu, hbm)
        # ideal-gather bound: only the m true neighbors (reference math)
        imacs = 2 * b * h * n * (m + 1) * c_
        ideal = max(2 * imacs / MXU_FLOPS,
                    9 * b * h * n * (m + 1) / VPU_FLOPS, hbm)
        meas = MEASURED_MS.get((preset, n))
        tot_sol += sol * r["count"]
        tot_ideal += ideal * r["count"]
        if meas:
            tot_meas += meas / 1e3 * r["count"]
        print(f"{r['path']:>13} n={n:<5} {r['count']:>4} {W:>5} "
              f"{mxu * 1e3:>6.2f} {vpu * 1e3:>6.2f} {hbm * 1e3:>6.2f} "
              f"{sol * 1e3:>6.2f} {ideal * 1e3:>6.2f} "
              f"{(meas or float('nan')):>6.2f} "
              f"{(meas / 1e3 / sol if meas else float('nan')):>6.2f}")
    print(f"# totals: SOL {tot_sol * 1e3:.1f} ms, ideal-gather "
          f"{tot_ideal * 1e3:.1f} ms, measured (attn only) "
          f"{tot_meas * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
