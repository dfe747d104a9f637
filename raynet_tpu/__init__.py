"""raynet_tpu — a TPU-native (JAX/XLA/Pallas) framework for learned
volumetric 3D reconstruction with ray potentials.

Re-implements, TPU-first, the capabilities of RayNet (CVPR'18): a multi-view
CNN plane-sweep depth estimator coupled with an MRF over voxel occupancies
solved by unrolled sum-product belief propagation, trained end-to-end.

Reference behavior parity: /root/reference (paschalidoud/raynet). The
reference's numpy/TF/CUDA kernel triplication collapses here into single JAX
implementations that are simultaneously differentiable (training) and fast
(jitted inference), with numpy oracles kept for tests only.
"""

__author__ = "raynet-tpu developers"
__license__ = "MIT"
__version__ = "0.1.0"
