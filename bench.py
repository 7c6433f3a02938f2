"""Benchmark: AFF-Mini forward throughput on one chip vs the V100 baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference AFF-Mini at 1337 img/s on a single V100, measured with
the repo's own throughput mode (README.md:46, main.py:387-414). We replicate
that protocol: one batch, 50 warmup + 30 timed forwards.
"""

import json
import sys
import time

V100_BASELINE_FPS = 1337.0  # AFF-Mini, README.md:46
BATCH = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer

    model = AutoFocusFormer(
        num_classes=1000,
        embed_dim=(32, 128, 256, 384),
        cluster_size=8,
        nbhd_size=(48, 48, 48, 49),
        depths=(2, 2, 6, 2),
        num_heads=(2, 4, 8, 16),
        mlp_ratio=2.0,
        img_size=224,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 224, 224, 3), jnp.float32
    )
    variables = model.init(rng, images[:1], training=False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
    fwd(variables, images).block_until_ready()  # compile
    for _ in range(50):
        fwd(variables, images)
    jax.block_until_ready(fwd(variables, images))
    t1 = time.time()
    for _ in range(30):
        out = fwd(variables, images)
    out.block_until_ready()
    t2 = time.time()
    fps = 30 * BATCH / (t2 - t1)

    print(
        json.dumps(
            {
                "metric": "aff_mini_224_fwd_images_per_sec",
                "value": round(fps, 1),
                "unit": "img/s",
                "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
