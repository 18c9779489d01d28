from bhnerf_tpu.geodesics import kerr
from bhnerf_tpu.geodesics.dataset import Geodesics, image_plane_geos, trace_geodesics
