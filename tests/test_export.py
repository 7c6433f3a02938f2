"""Serving export roundtrip: jax.export artifact reproduces model.apply."""

import jax
import jax.numpy as jnp
import numpy as np

from ml_autofocusformermod_tpu.ckpt import export as mexport
from ml_autofocusformermod_tpu.models.aff import AutoFocusFormer


def test_export_roundtrip(tmp_path):
    model = AutoFocusFormer(
        num_classes=10,
        embed_dim=(16, 32, 48, 64),
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 4, 4),
        img_size=56,
        drop_path_rate=0.0,
    )
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    variables = model.init(jax.random.PRNGKey(0), images, training=False)
    want = model.apply(variables, images, training=False)

    data = mexport.export_forward(model, variables, 2, 56)
    path = str(tmp_path / "aff.jaxexport")
    mexport.save_exported(path, data)

    fn = mexport.load_exported(path)
    got = fn(variables, images)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
