from hugs_tpu.render.camera import Camera, make_camera
from hugs_tpu.render.project import project_gaussians, ProjectedGaussians
from hugs_tpu.render.renderer import render, render_human_scene
