"""Serving-latency bench: single-image (and small-batch) forward latency.

The reference only publishes batched throughput (``main.py:387-414``); a
production serving deployment cares about per-request latency at batch
1/8. Same chained-jit protocol as bench.py (per-dispatch tunnel latency
excluded): CHUNK forwards inside one ``fori_loop`` jit, inputs perturbed
per iteration, completion forced by a scalar readback; latency = chained
seconds / CHUNK.

Usage:
    python scripts/bench_latency.py [preset ...]   # default: mini small
Env: MLAFF_LAT_BATCHES="1 8" to change the batch list.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNK = 50


def run(preset: str, batch: int) -> None:
    from bench_common import host_init
    from bench_train import _build

    config, model = _build(preset)
    size = config.DATA.IMG_SIZE
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
    variables = host_init(
        model, jax.random.PRNGKey(0), images[:1], training=False
    )

    @jax.jit
    def chain(variables, images):
        def body(i, acc):
            logits = model.apply(
                variables, images + i.astype(jnp.float32) * 1e-6,
                training=False,
            )
            return acc + logits.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, CHUNK, body, jnp.float32(0.0))

    t0 = time.time()
    float(chain(variables, images))
    print(f"# compile+warm {time.time() - t0:.1f}s {preset} b{batch}")
    float(chain(variables, images))
    t1 = time.time()
    reps = 3
    for _ in range(reps):
        float(chain(variables, images))
    sec = (time.time() - t1) / reps
    lat_ms = sec / CHUNK * 1e3
    print(json.dumps({
        "metric": f"aff_{preset}_{size}_b{batch}_fwd_latency_ms",
        "value": round(lat_ms, 3), "unit": "ms",
        "vs_baseline": None,
    }))


def main() -> None:
    presets = sys.argv[1:] or ["mini", "small"]
    batches = [int(b) for b in os.environ.get("MLAFF_LAT_BATCHES", "1 8").split()]
    for preset in presets:
        for batch in batches:
            run(preset, batch)


if __name__ == "__main__":
    main()
