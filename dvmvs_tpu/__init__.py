"""dvmvs_tpu — TPU-native online multi-view-stereo depth-from-video framework.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of
the reference system `ardaduz/deep-video-mvs` (CVPR 2021).
"""

__version__ = "0.1.0"
