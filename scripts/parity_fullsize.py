"""Full-SIZE full-model logit parity: reference torch AFF (CPU oracle,
random init) vs our JAX AFF at the TRUE published configs — 224x224,
real embed dims/depths/heads (reference configs/aff_mini.yaml,
aff_small.yaml) — not the tiny shapes of tests/test_model_parity.py.

The Apple pretrained .pth URLs (reference README.md:46-51) are
unreachable from this box (zero egress; DNS resolution fails), so this
random-weights run at real scale is the substitute VERDICT r1 asks for:
it exercises every shape-dependent code path (stage-1 grid clustering at
n=3136, k=392 clusters of 8, nbhd 48, the 49-token global stage 4, the
full pe-table at R=55) end to end through the .pth importer.

Usage: JAX_PLATFORMS=cpu python scripts/parity_fullsize.py [mini|small] [batch]
Writes max-abs / rel diffs to stdout; exits non-zero on tolerance failure.
"""

import os
import sys
import time

# FORCE cpu (not setdefault): the ambient env points JAX_PLATFORMS at the
# axon TPU tunnel, and this oracle run must never contend for the chip.
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

PRESETS = {
    # reference configs/aff_mini.yaml
    "mini": dict(
        embed_dim=[32, 128, 256, 384], depths=[2, 2, 6, 2],
        num_heads=[2, 4, 8, 16], mlp_ratio=2.0, layer_scale=0.0,
    ),
    # reference configs/aff_small.yaml (drop_path inactive in eval)
    "small": dict(
        embed_dim=[96, 192, 384, 768], depths=[3, 4, 18, 2],
        num_heads=[3, 6, 12, 24], mlp_ratio=3.0, layer_scale=1e-5,
    ),
}


def main() -> int:
    preset = sys.argv[1] if len(sys.argv) > 1 else "mini"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    arch = PRESETS[preset]

    import jax

    # belt and braces: the ambient sitecustomize registers the accelerator
    # plugin in a way that can outrank the env var (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from ref_oracle import load_reference_package
    from ml_autofocusformermod_tpu.ckpt.pth_import import (
        import_torch_state_dict,
    )
    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    common = dict(
        num_classes=1000, cluster_size=8, nbhd_size=[48, 48, 48, 49],
        drop_path_rate=0.0, img_size=224,
    )
    ref = load_reference_package()
    torch.manual_seed(0)
    t0 = time.time()
    ref_model = ref.aff_transformer.AutoFocusFormer(
        in_chans=3, alpha=4.0, ds_rate=0.25, **common, **arch
    )
    ref_model.eval()
    print(f"[{preset}] torch model built {time.time()-t0:.1f}s "
          f"({sum(p.numel() for p in ref_model.parameters())/1e6:.2f}M params)")

    model = AutoFocusFormer(
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in {**common, **arch}.items()},
        dtype=jnp.float32,
    )
    x0 = jnp.zeros((1, 224, 224, 3))
    t0 = time.time()
    variables = model.init(jax.random.PRNGKey(0), x0, training=False)
    print(f"[{preset}] jax init {time.time()-t0:.1f}s")

    state_dict = {
        k: v.detach().numpy() for k, v in ref_model.state_dict().items()
    }
    variables, missing, unexpected = import_torch_state_dict(
        dict(variables), state_dict
    )
    assert not missing, f"missing: {missing[:5]}"
    assert not unexpected, f"unexpected: {unexpected[:5]}"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)

    t0 = time.time()
    with torch.no_grad():
        ref_logits = ref_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()
    print(f"[{preset}] torch fwd {time.time()-t0:.1f}s")

    t0 = time.time()
    with jax.default_matmul_precision("highest"):
        logits = np.asarray(
            jax.jit(lambda v, x: model.apply(v, x, training=False))(
                variables, jnp.asarray(x)
            )
        )
    print(f"[{preset}] jax fwd (incl compile) {time.time()-t0:.1f}s")

    diff = np.abs(logits - ref_logits)
    denom = np.maximum(np.abs(ref_logits), 1e-6)
    print(
        f"[{preset}] b{batch} 224x224 fp32: max_abs_diff {diff.max():.3e} "
        f"mean_abs {diff.mean():.3e} max_rel {(diff/denom).max():.3e} "
        f"logit_range [{ref_logits.min():.3f}, {ref_logits.max():.3f}]"
    )
    top1_match = (logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    print(f"[{preset}] argmax agreement {top1_match:.3f}")
    ok = diff.max() < 5e-3 and top1_match == 1.0
    print(f"[{preset}] PARITY {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
