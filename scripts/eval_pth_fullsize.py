"""End-to-end `.pth` import + eval at FULL AFF-Mini scale on CPU.

The Apple pretrained checkpoints (reference README.md:46-51) are not
downloadable from this box (zero egress — DNS fails), so this drives the
exact same pipeline with a synthetic full-size checkpoint instead: build
the untouched torch reference AutoFocusFormer at the published AFF-Mini
config, `torch.save` its `state_dict` (conv weights OIHW, fused kv, BN
running stats — everything a real `.pth` has), then run
`main.py --eval --resume that.pth` at 224x224 and check the importer
consumed every tensor. Accuracy is meaningless (random weights, synthetic
val data); the assertion is 0 missing / 0 unexpected + a finishing eval.

Usage: python scripts/eval_pth_fullsize.py [workdir]
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="pth_eval_"
    )
    os.makedirs(work, exist_ok=True)
    pth = os.path.join(work, "aff_mini_synth.pth")

    import torch

    from ref_oracle import load_reference_package

    ref = load_reference_package()
    torch.manual_seed(0)
    model = ref.aff_transformer.AutoFocusFormer(
        in_chans=3, num_classes=1000,
        embed_dim=[32, 128, 256, 384], depths=[2, 2, 6, 2],
        num_heads=[2, 4, 8, 16], mlp_ratio=2.0, cluster_size=8,
        nbhd_size=[48, 48, 48, 49], alpha=4.0, ds_rate=0.25,
        layer_scale=0.0, drop_path_rate=0.0, img_size=224,
    )
    # a real checkpoint stores {'model': state_dict, ...} (utils.py:58-69)
    torch.save({"model": model.state_dict(), "epoch": 299}, pth)
    print(f"synthetic full-size checkpoint: {pth} "
          f"({os.path.getsize(pth) / 1e6:.1f} MB, "
          f"{len(model.state_dict())} tensors)")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--cfg",
        os.path.join(REPO, "ml_autofocusformermod_tpu/configs/aff_mini.yaml"),
        "--eval", "--resume", pth,
        "--batch-size", "8",
        "--data-path", os.path.join(work, "no-imagenet-here"),
        "--output", os.path.join(work, "out"),
    ]
    print("running:", " ".join(cmd))
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=7200)
    sys.stdout.write(out.stdout[-3000:])
    sys.stderr.write(out.stderr[-2000:])
    ok = (
        out.returncode == 0
        and "(0 missing / 0 unexpected)" in out.stdout
        and "Accuracy of the network" in out.stdout
    )
    print(f"\nPTH-EVAL {'OK' if ok else 'FAIL'} (rc={out.returncode})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
