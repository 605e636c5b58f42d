"""Bundled configs must match the reference config/*.json files."""

import json
import os

import pytest

from uplift_upsample_tpu.config import UpliftUpsampleConfig
from uplift_upsample_tpu.configs import CONFIGS, get_config, resolve_config

REFERENCE_CONFIG_DIR = "/root/reference/config"


@pytest.mark.parametrize("name", ["h36m_351", "h36m_351_pt", "amass_351", "h36m_81"])
def test_matches_reference_json(name):
    path = os.path.join(REFERENCE_CONFIG_DIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    with open(path) as f:
        ref = json.load(f)
    resolved = get_config(name).to_dict()
    for key, value in ref.items():
        assert key in resolved, f"{name}: missing {key}"
        assert resolved[key] == value, f"{name}: {key} = {resolved[key]!r} != {value!r}"


def test_resolve_config_accepts_name_and_path(tmp_path):
    cfg = resolve_config("h36m_81")
    assert cfg.SEQUENCE_LENGTH == 41
    path = tmp_path / "c.json"
    cfg.dump(str(path))
    cfg2 = resolve_config(str(path))
    assert cfg2.to_dict() == cfg.to_dict()


def test_unknown_name_raises():
    with pytest.raises(FileNotFoundError):
        resolve_config("not_a_config")
