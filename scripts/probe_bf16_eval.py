"""bf16-vs-fp32 full-size eval agreement on chip (VERDICT r4 #5b).

The eventual acc@1 parity eval will run bf16 on TPU against numbers
published from fp32/AMP V100 runs (reference README.md:46-59). This
probe bounds the delta that bf16 itself can introduce: import full-size
torch weights through the .pth pipeline (random-init torch model — the
published files are unreachable from this zero-egress box, and the
import path is exactly the one a real .pth would take), run the SAME
batch >= 256 through the fp32 and bf16 model variants ON CHIP, and
report argmax agreement + top-5 overlap + logit deltas.

Random weights are a pessimistic margin model (trained logit margins are
wider), so the agreement measured here is a lower bound on what a
trained checkpoint would see.

Usage: python scripts/probe_bf16_eval.py [mini|small] [batch]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PRESETS = {
    "mini": dict(
        embed_dim=(32, 128, 256, 384), depths=(2, 2, 6, 2),
        num_heads=(2, 4, 8, 16), mlp_ratio=2.0, layer_scale=0.0,
    ),
    "small": dict(
        embed_dim=(96, 192, 384, 768), depths=(3, 4, 18, 2),
        num_heads=(3, 6, 12, 24), mlp_ratio=3.0, layer_scale=1e-5,
    ),
}


def main() -> None:
    preset = sys.argv[1] if len(sys.argv) > 1 else "small"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    arch = PRESETS[preset]

    import torch

    from ref_oracle import load_reference_package
    from ml_autofocusformermod_tpu.ckpt.pth_import import (
        import_torch_state_dict,
    )
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    common = dict(
        num_classes=1000, cluster_size=8, nbhd_size=(48, 48, 48, 49),
        drop_path_rate=0.0, img_size=224,
    )
    ref = load_reference_package()
    torch.manual_seed(0)
    ref_model = ref.aff_transformer.AutoFocusFormer(
        in_chans=3, alpha=4.0, ds_rate=0.25,
        **{k: list(v) if isinstance(v, tuple) else v
           for k, v in {**common, **arch}.items()},
    )
    ref_model.eval()
    state_dict = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }

    # natural-ish inputs: low-frequency fields + texture, ImageNet-normalized
    rng = np.random.default_rng(0)
    small = rng.uniform(-1.5, 1.5, (batch, 8, 8, 3)).astype(np.float32)
    x = np.repeat(np.repeat(small, 28, axis=1), 28, axis=2)
    x = (x + 0.3 * rng.standard_normal(x.shape)).astype(np.float32)

    logits = {}
    # micro-batch 64: the fp32 Small fwd at one b256 dispatch needs
    # 29.5 G of HBM (queue r5a-15 OOM); chunking changes nothing about
    # the per-image numerics being compared
    mb = min(batch, 64)
    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = AutoFocusFormer(**common, **arch, dtype=dtype)
        variables = jax.jit(
            lambda m=model: m.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                training=False,
            )
        )()
        variables, missing, unexpected = import_torch_state_dict(
            dict(variables), state_dict
        )
        assert not missing and not unexpected, (missing[:3], unexpected[:3])
        t0 = time.time()
        fwd = jax.jit(lambda v, xx, m=model: m.apply(v, xx, training=False))
        outs = [
            np.asarray(fwd(variables, jnp.asarray(x[i:i + mb])), np.float32)
            for i in range(0, batch, mb)
        ]
        out = np.concatenate(outs, axis=0)
        print(f"# {name} fwd b{batch} (mb {mb}) {time.time()-t0:.1f}s "
              f"(incl compile)", file=sys.stderr)
        logits[name] = out

    a, b = logits["fp32"], logits["bf16"]
    top1 = (a.argmax(-1) == b.argmax(-1)).mean()
    t5a = np.argsort(-a, axis=-1)[:, :5]
    t5b = np.argsort(-b, axis=-1)[:, :5]
    top5_overlap = np.mean([
        len(set(r1) & set(r2)) / 5.0 for r1, r2 in zip(t5a, t5b)
    ])
    # margin analysis: flips happen where the fp32 top-2 margin is below
    # the bf16 logit noise; report both so the acc@1 bound is explicit
    sorted_a = np.sort(a, axis=-1)
    margin = sorted_a[:, -1] - sorted_a[:, -2]
    noise = np.abs(a - b).max(-1)
    print(json.dumps({
        "metric": f"bf16_eval_agreement_{preset}_b{batch}",
        "top1_agree": round(float(top1), 4),
        "top5_overlap": round(float(top5_overlap), 4),
        "logit_maxabs_delta": round(float(np.abs(a - b).max()), 5),
        "logit_meanabs_delta": round(float(np.abs(a - b).mean()), 6),
        "median_top2_margin_fp32": round(float(np.median(margin)), 5),
        "median_rowwise_noise": round(float(np.median(noise)), 6),
        "unit": "fraction",
    }))


if __name__ == "__main__":
    main()
