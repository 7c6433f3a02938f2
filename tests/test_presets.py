"""Every shipped preset builds at its PUBLISHED depths and traces a forward.

Round-2 lesson: the other tests shrink DEPTHS to keep CPU wall-clock down,
which let a factory bug (OracleTeacher passing a 1-tuple drop-path that
MixResBasicLayer indexes per block) survive to the on-chip bench queue.
This test runs ``jax.eval_shape`` over ``model.init`` — full abstract
tracing of init + forward at the exact shipped config, no FLOPs, no
device — so any shape/indexing/factory bug in a published preset fails
here first.  Reference presets: ``/root/reference/configs/*.yaml``.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from ml_autofocusformermod_tpu.config import load_config
from ml_autofocusformermod_tpu.models.build import build_model

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "ml_autofocusformermod_tpu", "configs"
)
CONFIGS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(CFG_DIR, "*.yaml"))
)


@pytest.mark.parametrize("cfg_name", CONFIGS)
def test_preset_builds_and_traces(cfg_name):
    cfg = load_config(os.path.join(CFG_DIR, cfg_name))
    model = build_model(cfg)
    size = int(cfg.DATA.IMG_SIZE)
    x = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)

    def init_fn(x):
        return model.init(
            {"params": jax.random.PRNGKey(0), "upsample": jax.random.PRNGKey(1)},
            x,
            training=False,
        )

    variables = jax.eval_shape(init_fn, x)
    assert "params" in variables

    def fwd(variables, x):
        return model.apply(
            variables, x, training=False,
            rngs={"upsample": jax.random.PRNGKey(2)},
        )

    out = jax.eval_shape(fwd, variables, x)
    # Head output: logits over NUM_CLASSES (a list when aux heads are on).
    leaves = out if isinstance(out, (list, tuple)) else [out]
    for leaf in leaves:
        assert leaf.shape[0] == 1
        assert leaf.shape[-1] == int(cfg.MODEL.NUM_CLASSES)
