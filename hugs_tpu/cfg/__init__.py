from hugs_tpu.cfg.config import Config, default_config, load_config, get_cfg_items
