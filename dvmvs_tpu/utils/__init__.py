from dvmvs_tpu.utils.errors import ERROR_NAMES, compute_errors
from dvmvs_tpu.utils.keyframe_buffer import KeyframeBuffer, SimpleBuffer
