"""udal_tpu — TPU-native uncertainty-aware detection & auto-labeling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`continental/uncertainty-detection-autolabeling`: uncertainty-aware
EfficientDet (aleatoric loss attenuation + epistemic MC-dropout/ensembles),
exact uncertainty decoding, calibration, cost-sensitive thresholding,
auto-labeling, active learning and semi-supervised learning — designed
TPU-first (SPMD meshes, vmap'd sample axes, fused on-device post-processing).
"""

__version__ = "0.1.0"
