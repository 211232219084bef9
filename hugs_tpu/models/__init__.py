from hugs_tpu.models.scene_gs import SceneGS, scene_forward
