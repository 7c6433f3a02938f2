"""TPU-native AutoFocusFormer / MaskFiner framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Eiphodos/ml-autofocusformerMod`` (reference mounted at ``/root/reference``):

* off-grid vision backbones whose tokens live as 2-D point clouds,
* balanced clustering along space-filling curves (``ops.sfc``),
* local attention over nearest clusters with fused TPU kernels
  (``ops.clusten`` / ``ops.clusten_pallas``; reference: CLUSTEN CUDA ext),
* learned adaptive downsampling (``models.layers.ClusterMerging``),
* the fork's MaskFiner mixed-resolution model family (``models.mixres_*``,
  ``models.maskfiner_*``),
* a pjit/mesh data-parallel trainer (``train``, ``parallel``) and the same
  YAML-config + CLI surface as the reference (``config``, ``main.py``).

Design stance: everything that is dynamic in the reference (token counts,
cluster counts, neighborhood sizes, keep/reserve counts) is a compile-time
constant for a given config, so the whole model runs under one ``jax.jit``
with static shapes; clustering is sort/argsort, selection is top-k, and the
CLUSTEN gather-ops are Pallas kernels over padded cluster-sorted tokens.
"""

__version__ = "0.1.0"
