from hugs_tpu.data.cameras import (
    get_static_camera, get_rotating_camera, get_predefined_pose,
    get_smpl_static_params, get_smpl_canon_params,
)
from hugs_tpu.data.colmap import read_colmap_scene, write_colmap_bin
from hugs_tpu.data.neuman import NeumanDataset
