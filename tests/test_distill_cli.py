"""Distillation CLI smoke: prepared data + teacher ckpt → staged students."""
import json
import os

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from test_data_cli import write_synth_pair


def test_distill_cli_two_stages(tmp_path):
    from diffusestylegesture_tpu.cli.distill import main as distill_main
    from diffusestylegesture_tpu.cli.prepare_data import main as prep_main
    from diffusestylegesture_tpu.data import ZeggsWindowDataset
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig

    src = tmp_path / "src"
    src.mkdir()
    write_synth_pair(str(src), "001_Happy_0_x_1_0", seconds=6.0, seed=0)
    data_dir = str(tmp_path / "prepared")
    prep_main(["--dataset", "ZEGGS", "--source", str(src), "--target", data_dir])
    # populate the window cache with (zero) wavlm features
    ZeggsWindowDataset(
        f"{data_dir}/train", lambda w: np.zeros((len(w), 88, 1024), np.float32)
    )

    mcfg = MDMConfig(njoints=1141, latent_dim=128, ff_size=64, num_layers=1,
                     n_seed=8, window_size=11)
    model = MDM(mcfg)
    x = jnp.zeros((1, 1141, 1, 88))
    cond = {"style": jnp.zeros((1, 6)), "seed": x[..., :8],
            "audio": jnp.zeros((1, 88, 1024)), "mask_local": jnp.ones((1, 88), bool)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)

    import orbax.checkpoint as ocp

    teacher_dir = str(tmp_path / "teacher")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(teacher_dir), params)
    ckpt.wait_until_finished()

    cfg = dict(
        dataset="ZEGGS", data_dir=data_dir, n_poses=88,
        motion_resampling_framerate=20, subdivision_stride=10, batch_size=2,
        n_seed=8, njoints=1141, latent_dim=128, ff_size=64, num_layers=1,
        cond_mask_prob=0.1, cond_mode="cross_local_attention3_style1",
        audio_feat="wavlm", diffusion_steps=8, noise_schedule="cosine",
        lr=1e-4,
    )
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out_dir = str(tmp_path / "distilled")
    distill_main([
        "--config", str(cfg_path), "--teacher", teacher_dir,
        "--save_dir", out_dir, "--stages", "2", "--steps_per_stage", "2",
    ])

    s0 = os.path.join(out_dir, "stage0_steps4")
    s1 = os.path.join(out_dir, "stage1_steps2")
    for stage_dir, n in ((s0, 4), (s1, 2)):
        assert os.path.isdir(os.path.join(stage_dir, "params"))
        meta = json.load(open(os.path.join(stage_dir, "schedule.json")))
        assert meta["base_steps"] == 8
        assert len(meta["use_timesteps"]) == n

    # the distilled grids nest: stage1 keeps the odd half of stage0's grid
    g0 = json.load(open(os.path.join(s0, "schedule.json")))["use_timesteps"]
    g1 = json.load(open(os.path.join(s1, "schedule.json")))["use_timesteps"]
    assert set(g1) <= set(g0)
    assert g1 == sorted(g0)[1::2]

    # the stage loader feeds a working few-step sampler
    from diffusestylegesture_tpu.cli.distill import load_distilled
    from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler

    params_d, sched_d = load_distilled(s1)
    assert sched_d.num_timesteps == 2
    np.testing.assert_array_equal(np.asarray(sched_d.timestep_map), g1)

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    def wavlm_stub(_p, w):
        return jnp.zeros((w.shape[0], 88, 1024))

    eng = ZeggsSampler(model_apply, wavlm_stub, sched_d,
                       ZeggsEngineConfig(njoints=1141, sampler="ddim"))
    audio = np.zeros(eng.cfg.samples_per_stride, np.float32)
    out = eng.generate(params_d, {}, audio, np.eye(6, dtype=np.float32)[:1],
                       jax.random.PRNGKey(0))
    assert out.shape == (1, eng.cfg.stride - eng.cfg.n_seed, 1141)
    assert np.isfinite(out).all()
