"""YAML + CLI-override configuration.

Parity with the reference's pattern (`main/mydiffusion_zeggs/configs/
parse_args.py` + the `__main__` merge in `end2end.py:52-100` /
`sample.py:400-420`): a YAML file is loaded into a dict, CLI flags
override it, and dataset-conditional derived fields are injected
(`BEAT-TWH-main/mydiffusion_beat_twh/end2end.py:60-100`). The result is
an attribute-accessible Config instead of an EasyDict.
"""
from __future__ import annotations

import argparse
from types import SimpleNamespace
from typing import Dict, Optional

import yaml


class Config(SimpleNamespace):
    def __getitem__(self, k):
        return getattr(self, k)

    def __contains__(self, k):
        return hasattr(self, k)

    def get(self, k, default=None):
        return getattr(self, k, default)

    def to_dict(self) -> Dict:
        return dict(self.__dict__)


def load_yaml_config(path: str, overrides: Optional[Dict] = None) -> Config:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    for k, v in (overrides or {}).items():
        if v is not None:
            cfg[k] = v
    return Config(**cfg)


def apply_beat_twh_derivations(cfg: Config) -> Config:
    """Dataset-conditional fields (`end2end.py:66-99`)."""
    name_to_mode = {
        "DiffuseStyleGesture": "cross_local_attention3_style1",
        "DiffuseStyleGesture+": "cross_local_attention4_style1",
        "DiffuseStyleGesture++": "cross_local_attention5_style1",
    }
    cfg.cond_mode = name_to_mode[cfg.name]
    version = cfg.get("version", "v0")
    if cfg.dataset == "BEAT":
        cfg.style_dim = 2
        cfg.audio_feature_dim = 1434
        if "v0" in version:
            cfg.motion_dim = 684
            cfg.njoints = 2052
        elif "v2" in version:
            cfg.motion_dim = 1141
            cfg.njoints = 1141
        else:
            raise NotImplementedError(
                f"BEAT version {version!r} (supported: v0*, v2*)")
    elif cfg.dataset == "TWH":
        cfg.motion_dim = 744
        cfg.njoints = 2232
        cfg.latent_dim = 512
        cfg.audio_feat_dim_latent = 128
        cfg.style_dim = 17
        cfg.audio_feature_dim = 1435
    else:
        raise NotImplementedError(cfg.dataset)
    return cfg


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default=None)
    p.add_argument("--seed", type=int, default=123456)
    return p
