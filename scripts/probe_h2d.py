"""Attribute the epoch-loop gap: H2D (tunnel) bandwidth + loader IPC.

The assembled main.py loop sustained ~67 img/s on this box vs the 1060
img/s bare train step; decode measures 2.4 ms/img (416 img/s/core), so
neither the step nor the decode explains the gap. The two remaining legs:

1. jax.device_put of a b128 float32 batch (77 MB) THROUGH THE AXON
   TUNNEL — on production TPU hosts this is a PCIe copy; here it is an
   HTTP relay. Measured for float32 / float16 / uint8 payloads.
2. torch-DataLoader worker IPC: a 1-worker loader pickles the collated
   float32 batch through a pipe; measured end-to-end yield rate.

Usage: python scripts/probe_h2d.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))


def h2d():
    out = {}
    for name, dtype, scale in (
        ("float32", np.float32, 1.0),
        ("float16", np.float16, 1.0),
        ("uint8", np.uint8, 255.0),
    ):
        x = (np.random.default_rng(0).random((128, 224, 224, 3)) * scale
             ).astype(dtype)
        mb = x.nbytes / 2**20
        # warm one transfer (connection setup)
        jax.block_until_ready(jax.device_put(x))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            jax.block_until_ready(jax.device_put(x))
        dt = (time.time() - t0) / reps
        out[name] = {
            "batch_mb": round(mb, 1),
            "sec_per_batch": round(dt, 3),
            "mb_per_s": round(mb / dt, 1),
            "img_per_s_bound": round(128 / dt, 1),
        }
    print(json.dumps({"metric": "h2d_tunnel_bandwidth", **out}))


def loader_ipc():
    from ml_autofocusformermod_tpu.config import load_config
    from ml_autofocusformermod_tpu.data.imagenet import build_dataset, Loader

    cfg = load_config(os.path.join(
        REPO, "ml_autofocusformermod_tpu", "configs", "aff_mini.yaml"))
    cfg.defrost()
    cfg.DATA.DATA_PATH = os.path.join(REPO, ".synth_imagenet")
    cfg.freeze()
    ds, _ = build_dataset(cfg, is_train=True)
    for workers in (0, 1):
        loader = Loader(ds, batch_size=128, shuffle=False, drop_last=True,
                        num_workers=workers)
        it = iter(loader)
        next(it)  # warm worker spawn
        t0 = time.time()
        n = 0
        for batch in it:
            n += 1
            if n >= 8:
                break
        dt = (time.time() - t0) / n
        print(json.dumps({
            "metric": f"loader_rate_workers{workers}",
            "sec_per_batch": round(dt, 3),
            "img_per_s": round(128 / dt, 1),
        }))


if __name__ == "__main__":
    h2d()
    loader_ipc()
