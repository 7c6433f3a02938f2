"""Export a config's forward pass as a portable serving artifact.

Usage:
    python scripts/export_model.py --cfg <yaml> --out model.jaxexport \
        [--batch-size N] [--platform tpu] [--resume ckpt]

The artifact takes (variables, images) at call time — pair it with an
Orbax checkpoint or an imported .pth tree. See ckpt/export.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--platform", default=None,
                   help="target platform (e.g. tpu); default = current")
    p.add_argument("--resume", default=None, help=".pth or orbax checkpoint")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.ckpt import export as mexport
    from ml_autofocusformermod_tpu.ckpt import pth_import
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.models.build import build_model

    cfg = load_config(args.cfg)
    if args.platform and args.platform != "cpu":
        # Mosaic custom calls are not portable; export the XLA path
        cfg.defrost(); cfg.TPU.USE_PALLAS = False; cfg.freeze()
    model = build_model(cfg)
    img = jnp.zeros((1, cfg.DATA.IMG_SIZE, cfg.DATA.IMG_SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, training=False)
    if args.resume and args.resume.endswith(".pth"):
        sd = pth_import.load_pth_state_dict(args.resume)
        variables, _, _ = pth_import.import_torch_state_dict(variables, sd)

    data = mexport.export_forward(
        model, variables, args.batch_size, cfg.DATA.IMG_SIZE,
        platforms=[args.platform] if args.platform else None,
    )
    mexport.save_exported(args.out, data)
    print(f"wrote {args.out} ({len(data)} bytes, "
          f"batch={args.batch_size}, img={cfg.DATA.IMG_SIZE})")


if __name__ == "__main__":
    main()
