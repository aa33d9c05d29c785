import os

import pytest

from nerf_pytorch_paeng_tpu.config import (
    NerfConfig, config_from_file, load_config, parse_config_file)

REF_CFG = "/root/reference/configs"


def test_defaults_validate():
    NerfConfig().validate()


@pytest.mark.skipif(not os.path.isdir(REF_CFG),
                    reason="reference configs not mounted")
def test_parses_reference_blender_lego():
    cfg = config_from_file(os.path.join(REF_CFG, "blender", "lego.txt"))
    assert cfg.data_type == "blender"
    assert cfg.data_name == "lego"
    assert cfg.near == 2.0 and cfg.far == 6.0
    assert cfg.bkg_white is True           # bare `bkg_white_true` flag
    assert cfg.global_batch is False       # bare `global_batch_false` flag
    assert cfg.iter_N == 200000
    assert cfg.N_rays == 4096
    assert cfg.N_samples_c == 64 and cfg.N_samples_f == 128
    assert cfg.testskip == 1
    assert cfg.n_angle == 120 and cfg.phi == -30.0 and cfg.nf == 4.0
    assert cfg.idx_save == 100000
    assert cfg.idx_test == 200000 and cfg.idx_render == 200000
    assert cfg.gpu_ids == [1]


@pytest.mark.skipif(not os.path.isdir(REF_CFG),
                    reason="reference configs not mounted")
def test_parses_reference_llff_fern():
    cfg = config_from_file(os.path.join(REF_CFG, "llff", "fern.txt"))
    assert cfg.data_type == "llff"
    assert cfg.downsample == 8
    assert cfg.near == 0.0 and cfg.far == 1.0
    assert cfg.global_batch is True        # llff default: global batch on
    assert cfg.bkg_white is False
    assert cfg.testskip == 8


@pytest.mark.skipif(not os.path.isdir(REF_CFG),
                    reason="reference configs not mounted")
def test_all_16_reference_configs_parse():
    n = 0
    for sub in ("blender", "llff"):
        d = os.path.join(REF_CFG, sub)
        for f in sorted(os.listdir(d)):
            cfg = config_from_file(os.path.join(d, f))
            assert cfg.data_type == sub
            n += 1
    assert n == 16


def test_cli_overrides_config_file(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("data_type = blender\nN_rays = 1024\nbkg_white_true\n")
    cfg = load_config(["--config", str(p), "--N_rays", "2048"])
    assert cfg.N_rays == 2048
    assert cfg.bkg_white is True


def test_inline_comments_and_lists(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("iter_N = 1000   # comment\ngpu_ids = [0, 1]\n"
                 "perturb = 0.\n")
    vals = parse_config_file(str(p))
    assert vals["iter_N"] == 1000
    assert vals["gpu_ids"] == [0, 1]
    assert vals["perturb"] == 0.0


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("no_such_option = 3\n")
    with pytest.raises(KeyError):
        parse_config_file(str(p))
