from dvmvs_tpu.data.preprocess import PreprocessImage
from dvmvs_tpu.data.io import load_image, load_depth_png, load_scene
