"""Synthetic dataset builders for tests and smoke runs.

Produce tiny `.npz` files in the exact on-disk formats the loaders consume:
  - H36M 3D: {'positions_3d': {subject: {action: (T, 32, 3) float32}}}
  - H36M 2D detections: {'positions_2d': {subject: {action: [(T', 17, 2)] x 4 cams}}}
    in VideoPose3D 17-point order, pixel coordinates
  - AMASS: one npz per sub-dataset:
    {'positions_3d': {subject: {action: {'positions_3d': (T, 17, 3), 'frame_rate': 50.0}}}}
"""

from __future__ import annotations

import os

import numpy as np


def make_synthetic_h36m_npz(path_3d, path_2d,
                            subjects=("S1", "S5", "S6", "S7", "S8", "S9", "S11"),
                            action_frames=(("Walking", 90), ("Walking 1", 61),
                                           ("Photo", 45), ("Sitting", 70)),
                            extra_2d_frames=3, seed=7):
    """Write paired synthetic 3D/2D H36M npz files; returns (path_3d, path_2d)."""
    rng = np.random.default_rng(seed)
    positions_3d, positions_2d = {}, {}
    for subject in subjects:
        positions_3d[subject] = {}
        positions_2d[subject] = {}
        for action, frames in action_frames:
            pose = rng.normal(size=(frames, 32, 3)).astype(np.float32) * 0.2
            pose[..., 2] += 1.0  # keep roughly above ground
            positions_3d[subject][action] = pose
            cams = []
            for _ in range(4):
                kps = rng.uniform(100, 900, size=(frames + extra_2d_frames, 17, 2))
                cams.append(kps.astype(np.float32))
            positions_2d[subject][action] = cams
    np.savez_compressed(path_3d, positions_3d=positions_3d)
    np.savez_compressed(path_2d, positions_2d=positions_2d)
    return path_3d, path_2d


def make_synthetic_amass_dir(out_dir, datasets=("CMU", "SFU"), subjects=2, actions=2,
                             frames=80, seed=11):
    """Write synthetic AMASS npz files into `out_dir`; returns the dir."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for dataset in datasets:
        data = {}
        for s in range(subjects):
            subject = f"subj{s}"
            data[subject] = {}
            for a in range(actions):
                pose = rng.normal(size=(frames, 17, 3)).astype(np.float32) * 0.3
                pose[..., 2] += 1.0
                data[subject][f"act{a}"] = {
                    "positions_3d": pose,
                    "frame_rate": 50.0,
                }
        np.savez_compressed(os.path.join(out_dir, f"{dataset}.npz"), positions_3d=data)
    return out_dir
