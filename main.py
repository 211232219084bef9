"""Training CLI (reference main.py equivalent).

  python main.py --cfg_file cfg_files/neuman/hugs_human_scene.yaml \\
      [--cfg_id N] [dotted.key=value ...]

Merges defaults <- YAML <- CLI dotlist, expands list-valued leaves into a
config grid (select one with --cfg_id), sets up the logdir tree, builds
datasets + trainer, trains, validates, animates (reference main.py:24-108).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def setup_logdir(cfg):
    exp = cfg.exp_name
    cfg.logdir = os.path.join(cfg.output_path, cfg.dataset.name,
                              str(cfg.dataset.seq), exp)
    cfg.logdir_ckpt = os.path.join(cfg.logdir, "ckpt")
    for sub in ("", "ckpt", "train", "val", "anim", "meshes", "canon"):
        os.makedirs(os.path.join(cfg.logdir, sub), exist_ok=True)
    with open(os.path.join(cfg.logdir, "config_train.yaml"), "w") as f:
        f.write(cfg.to_yaml())


def build_datasets(cfg):
    from hugs_tpu.data import NeumanDataset
    root = cfg.dataset_path or "data/neuman/dataset"
    train_ds = val_ds = anim_ds = None
    if cfg.dataset.name == "neuman" and os.path.isdir(
            os.path.join(root, str(cfg.dataset.seq))):
        kw = dict(render_mode=cfg.mode,
                  add_bg_points=cfg.scene.add_bg_points,
                  num_bg_points=cfg.scene.num_bg_points,
                  bg_sphere_dist=cfg.scene.bg_sphere_dist,
                  clean_pcd=cfg.scene.clean_pcd)
        if not cfg.eval:
            train_ds = NeumanDataset(root, cfg.dataset.seq, "train", **kw)
        val_ds = NeumanDataset(root, cfg.dataset.seq, "val",
                               render_mode=cfg.mode)
        try:
            anim_ds = NeumanDataset(root, cfg.dataset.seq, "anim",
                                    render_mode=cfg.mode)
        except (FileNotFoundError, KeyError):
            anim_ds = None
    return train_ds, val_ds, anim_ds


def main(cfg):
    import numpy as np
    from hugs_tpu.train.trainer import GaussianTrainer

    np.random.seed(cfg.seed)
    setup_logdir(cfg)
    train_ds, val_ds, anim_ds = build_datasets(cfg)
    if train_ds is None and not cfg.eval:
        print(f"ERROR: dataset not found under "
              f"{cfg.dataset_path or 'data/neuman/dataset'} — "
              f"prepare the NeuMan data first", file=sys.stderr)
        return 1

    trainer = GaussianTrainer(cfg, train_ds, val_ds, anim_ds)
    if not cfg.eval:
        log = trainer.train()
        with open(os.path.join(cfg.logdir, "results_train.json"), "w") as f:
            json.dump(log, f)
        trainer.save_ckpt()
    if val_ds is not None:
        metrics = trainer.validate()
        with open(os.path.join(cfg.logdir, "results_eval.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics, indent=2))
    if anim_ds is not None:
        trainer.animate()
    if cfg.mode in ("human", "human_scene"):
        trainer.render_canonical(nframes=cfg.human.canon_nframes)
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", type=str, default=None)
    ap.add_argument("--cfg_id", type=int, default=-1)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from hugs_tpu.cfg import load_config, get_cfg_items
    cfg = load_config(args.cfg_file, args.overrides)
    items = get_cfg_items(cfg)
    if args.cfg_id >= 0:
        items = [items[args.cfg_id]]
    rc = 0
    for c in items:
        rc |= main(c) or 0
    sys.exit(rc)
