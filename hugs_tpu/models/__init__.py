from hugs_tpu.models.scene_gs import SceneGS, scene_forward
from hugs_tpu.models.smpl import (
    SMPLModel, SMPLOutput, smpl_forward, lbs_extra, load_smpl,
    synthetic_smpl, vitruvian_pose,
)
from hugs_tpu.models.subdivide import subdivide_smpl_model
from hugs_tpu.models.human_gs import (
    HumanGS, HumanGSState, HumanGSFixed, HumanGSConfig,
    init_human_gs, human_forward, canon_forward,
)
