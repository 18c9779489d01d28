from bhnerf_tpu.ops import gr
