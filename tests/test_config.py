import os
import tempfile

from hugs_tpu.cfg import default_config, load_config, get_cfg_items
from hugs_tpu.cfg.config import flatten, unflatten


def test_defaults_match_reference_values():
    cfg = default_config()
    assert cfg.train.num_steps == 30_000
    assert cfg.scene.lr.position_init == 0.00016
    assert cfg.human.loss.patch_size == 128
    assert cfg.scene.densify_grad_threshold == 0.0002


def test_yaml_and_dotlist_override():
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write("train:\n  num_steps: 123\nhuman:\n  sh_degree: 2\n")
        path = f.name
    try:
        cfg = load_config(path, overrides=["scene.lr.opacity=0.9",
                                           "bg_color=black"])
        assert cfg.train.num_steps == 123
        assert cfg.human.sh_degree == 2
        assert cfg.scene.lr.opacity == 0.9
        assert cfg.bg_color == "black"
        # untouched defaults survive
        assert cfg.scene.lr.scaling == 0.005
    finally:
        os.unlink(path)


def test_grid_expansion():
    cfg = default_config()
    cfg.human.sh_degree = [1, 2, 3]
    cfg.seed = [0, 1]
    items = get_cfg_items(cfg)
    assert len(items) == 6
    assert {i.human.sh_degree for i in items} == {1, 2, 3}
    assert all("sh_degree" in i.exp_name for i in items)


def test_flatten_roundtrip():
    cfg = default_config()
    assert unflatten(flatten(cfg.to_dict())).to_dict() == cfg.to_dict()
