"""bhnerf_tpu — TPU-native black-hole emission tomography framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
bhnerf package (gravitationally-lensed 3D emission recovery around Kerr
black holes from image-plane movies, EHT visibilities, or ALMA polarized
lightcurves), designed for jit + sharding over TPU device meshes.
"""
from bhnerf_tpu import constants, units, utils
from bhnerf_tpu import geodesics
from bhnerf_tpu import ops
from bhnerf_tpu import emission
from bhnerf_tpu import models
from bhnerf_tpu import parallel
from bhnerf_tpu import train
from bhnerf_tpu import observation
from bhnerf_tpu import alma
from bhnerf_tpu import config
from bhnerf_tpu import visualization
# reference-API facades (bhnerf.kgeo / bhnerf.network / bhnerf.optimization)
from bhnerf_tpu import kgeo
from bhnerf_tpu import network
from bhnerf_tpu import optimization
