"""vipe-tpu: TPU-native video annotation engine (poses, intrinsics, depth, masks).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NVIDIA ViPE
(reference at /root/reference; see SURVEY.md for the structural analysis).
"""

__version__ = "0.1.0"
