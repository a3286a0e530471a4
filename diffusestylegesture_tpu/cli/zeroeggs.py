"""ZeroEGGS CLI: prepare / train / generate.

The reference ships the full (non-diffusion) ZeroEGGS RNN gesture system
with its own entry points (`ubisoft-laforge-ZeroEGGS-main/ZEGGS/main.py`
for training, `generate.py:20-129` for stylized generation with style
blending). This CLI exposes the ported system end to end:

  prepare   paired wav+bvh dir → features npz (60 fps anim features via
            the ZEGGS featurizer + log-mel+energy audio features) +
            stats.npz — the `data_pipeline.py` role.
  train     windows over the prepared npz → VAE style encoder + speech
            encoder + autoregressive GRU decoder, RAdam + KL annealing —
            the `train.py:30-770` role. Saves cfg json + orbax params.
  generate  wav + style example bvh(s) → stylized BVH with `add` or
            `stitch` style blending — the `generate.py` role.

Feature layout (from the 1141-d ZEGGS vector at 60 fps):
  [0:3] root_pos  [3:7] root_rot  [7:10] root_vel  [10:13] root_vrt
  [13:238] lpos  [238:688] ltxy  [688:913] lvel  [913:1138] lvrt
  [1138:1141] gaze_dir
Anim input = vel/vrt + lpos + ltxy + lvel + lvrt + gaze (15J+9 = 1134).
"""
from __future__ import annotations

import argparse
import json
import os
from datetime import datetime

import numpy as np

J = 75
SLICES = {
    "root_pos": (0, 3),
    "root_rot": (3, 7),
    "root_vel": (7, 10),
    "root_vrt": (10, 13),
    "lpos": (13, 13 + J * 3),
    "ltxy": (13 + J * 3, 13 + J * 9),
    "lvel": (13 + J * 9, 13 + J * 12),
    "lvrt": (13 + J * 12, 13 + J * 15),
    "gaze_dir": (13 + J * 15, 13 + J * 15 + 3),
}


def _sl(feats: np.ndarray, name: str) -> np.ndarray:
    a, b = SLICES[name]
    return feats[..., a:b]


def anim_input_from_features(feats: np.ndarray) -> np.ndarray:
    """(T, 1141) → (T, 1134) style-encoder / anim-input vector."""
    return np.concatenate(
        [_sl(feats, k) for k in
         ("root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt", "gaze_dir")],
        axis=-1,
    )


def first_pose_state(feats_row: np.ndarray):
    """One feature row → the 8-tuple decoder initial state."""
    return (
        _sl(feats_row, "root_pos"),
        _sl(feats_row, "root_rot"),
        _sl(feats_row, "root_vel"),
        _sl(feats_row, "root_vrt"),
        _sl(feats_row, "lpos").reshape(J, 3),
        _sl(feats_row, "ltxy").reshape(J, 2, 3),
        _sl(feats_row, "lvel").reshape(J, 3),
        _sl(feats_row, "lvrt").reshape(J, 3),
    )


# ---------------------------------------------------------------------------
# prepare
# ---------------------------------------------------------------------------


def cmd_prepare(args) -> None:
    from ..data.zeroeggs_data import audio_features, feature_statistics
    from ..data.zeggs import load_wav_16k
    from ..motion import zeggs_features as zf

    wavs = sorted(
        f for f in os.listdir(args.source) if f.endswith(".wav")
        and os.path.exists(os.path.join(args.source, f[:-4] + ".bvh"))
    )
    if not wavs:
        raise SystemExit(f"no paired wav+bvh in {args.source}")
    os.makedirs(args.target, exist_ok=True)

    all_feats, all_audio, names = [], [], []
    for w in wavs:
        stem = w[:-4]
        feats = zf.featurize_bvh_file(
            os.path.join(args.source, stem + ".bvh"), fps=60
        )["features"].astype(np.float32)
        audio = load_wav_16k(os.path.join(args.source, w))
        af = audio_features(audio, 16000, 60.0, len(feats))
        all_feats.append(feats)
        all_audio.append(af)
        names.append(stem)
        print(f"{stem}: {feats.shape[0]} frames")

    anim_inputs = [anim_input_from_features(f) for f in all_feats]
    stats = feature_statistics(
        {
            "audio_input": np.concatenate(all_audio, 0),
            "anim_input": np.concatenate(anim_inputs, 0),
        }
    )
    # decoder output = vel/vrt + lpos/ltxy/lvel/lvrt (15J+6)
    anim_out = np.concatenate(
        [np.concatenate([_sl(f, k) for k in
                         ("root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt")],
                        axis=-1) for f in all_feats], 0)
    stats.update(feature_statistics({"anim_output": anim_out}))

    np.savez(
        os.path.join(args.target, "features.npz"),
        **{f"feats_{n}": f for n, f in zip(names, all_feats)},
        **{f"audio_{n}": a for n, a in zip(names, all_audio)},
        names=np.asarray(names),
    )
    np.savez(os.path.join(args.target, "stats.npz"), **stats)
    print("wrote", os.path.join(args.target, "features.npz"), "and stats.npz")


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------


def _build_networks(cfg_dict):
    from ..models.zeroeggs import (
        SpeechEncoder,
        StyleEncoderVAE,
        ZeroEGGSConfig,
        ZeroEGGSDecoder,
    )

    cfg = ZeroEGGSConfig(**cfg_dict)
    sp = SpeechEncoder(hidden_size=cfg.hidden_size, output_size=cfg.speech_encoding_size)
    st = StyleEncoderVAE(cfg.hidden_size, cfg.style_embedding_size,
                         encoder_type=cfg.style_encoder_type)
    dec = ZeroEGGSDecoder(cfg)
    return cfg, sp, st, dec


def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp

    from ..models.zeroeggs import make_zeroeggs_train_step
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    data = np.load(os.path.join(args.data, "features.npz"), allow_pickle=False)
    stats_np = dict(np.load(os.path.join(args.data, "stats.npz")))
    names = [str(n) for n in data["names"]]
    feats = [data[f"feats_{n}"] for n in names]
    audio = [data[f"audio_{n}"] for n in names]
    audio_dim = audio[0].shape[1]

    cfg_dict = dict(
        hidden_size=args.hidden_size,
        speech_encoding_size=args.speech_encoding_size,
        style_embedding_size=args.style_embedding_size,
        num_rnn_layers=args.num_rnn_layers,
        style_encoder_type=args.style_encoder,
    )
    cfg, sp, st, dec = _build_networks(cfg_dict)

    stats = {k: jnp.asarray(v) for k, v in stats_np.items()}
    key = jax.random.PRNGKey(args.seed)
    W, B = args.window, args.batch_size

    def sample_batch(rng):
        batch_feats, batch_audio = [], []
        # clips shorter than one window cannot be sampled (ragged stack)
        usable = [i for i in range(len(feats)) if len(feats[i]) >= W + 1]
        if not usable:
            raise SystemExit(
                f"no prepared clip has >= {W + 1} frames (--window {W})")
        for _ in range(B):
            ci = usable[rng.integers(len(usable))]
            T = len(feats[ci])
            # inclusive high: the last valid start T - W - 1 must be drawable
            s = rng.integers(0, T - W)
            batch_feats.append(feats[ci][s : s + W + 1])
            batch_audio.append(audio[ci][s + 1 : s + W + 1])
        f = np.stack(batch_feats)  # (B, W+1, 1141): frame 0 = initial state
        a = np.stack(batch_audio)  # (B, W, A)
        init = tuple(np.stack(x) for x in zip(*[first_pose_state(ff[0]) for ff in f]))
        tgt = f[:, 1:]
        anim_in = np.stack([anim_input_from_features(ff[1:]) for ff in f])
        return dict(
            initial_state=tuple(jnp.asarray(x) for x in init),
            gaze=jnp.asarray(_sl(tgt, "gaze_dir")),
            audio_features=jnp.asarray(a),
            # reference normalizes the style example before the encoder
            # (`train.py:224`); generation normalizes identically (below)
            style_example=(jnp.asarray(anim_in) - stats["anim_input_mean"])
            / stats["anim_input_std"],
            target_root_pos=jnp.asarray(_sl(tgt, "root_pos")),
            target_root_rot=jnp.asarray(_sl(tgt, "root_rot")),
            target_lpos=jnp.asarray(_sl(tgt, "lpos").reshape(B, W, J, 3)),
            target_ltxy=jnp.asarray(_sl(tgt, "ltxy").reshape(B, W, J, 2, 3)),
        )

    rng = np.random.default_rng(args.seed)
    b0 = sample_batch(rng)
    params = {
        "speech": sp.init(key, b0["audio_features"]),
        "style": st.init(key, b0["style_example"]),
        "decoder": dec.init(
            key, b0["initial_state"], b0["gaze"],
            jnp.zeros((B, W, cfg.speech_encoding_size)),
            jnp.zeros((B, W, cfg.style_embedding_size)),
            stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"],
        ),
    }
    init_fn, step_fn = make_zeroeggs_train_step(sp, st, dec, stats, lr=args.lr)
    step_fn = jax.jit(step_fn)
    opt_state = init_fn(params)
    for i in range(args.num_steps):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step_fn(params, opt_state, sample_batch(rng), sub, i)
        if i % max(1, args.num_steps // 10) == 0:
            print(f"step {i}: loss {float(aux['loss']):.4f} "
                  f"(rec {float(aux['rec']):.4f}, kl {float(aux['kl']):.4f})")

    import orbax.checkpoint as ocp

    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "config.json"), "w") as f:
        json.dump({**cfg_dict, "audio_dim": audio_dim}, f)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(os.path.join(args.save_dir, "params")), params)
    ckpt.wait_until_finished()
    print("wrote", args.save_dir)


# ---------------------------------------------------------------------------
# generate
# ---------------------------------------------------------------------------


def cmd_generate(args) -> None:
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..data.zeroeggs_data import audio_features
    from ..data.zeggs import load_wav_16k
    from ..motion import quat, txform
    from ..motion import zeggs_features as zf
    from ..sample.engine_zeroeggs import ZeroEggsGenerator

    with open(os.path.join(args.network, "config.json")) as f:
        cfg_dict = json.load(f)
    cfg_dict.pop("audio_dim", None)
    from ..models.zeroeggs import ZeroEGGSConfig

    cfg = ZeroEGGSConfig(**cfg_dict)
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(args.network, "params"))
    )
    stats = dict(np.load(args.stats))

    gen = ZeroEggsGenerator(
        cfg, params["speech"], params["style"], params["decoder"], stats
    )

    # style encodings from bvh examples (path[:start:end]) blended
    key = jax.random.PRNGKey(args.seed)
    encodings = []
    for spec in args.style:
        parts = spec.split(":")
        path = parts[0]
        feats = zf.featurize_bvh_file(path, fps=60)["features"]
        if len(parts) == 3:
            feats = feats[int(parts[1]) : int(parts[2])]
        ex = anim_input_from_features(feats)
        ex = (ex - stats["anim_input_mean"]) / stats["anim_input_std"]
        key, sub = jax.random.split(key)
        encodings.append(
            gen.encode_style(ex, key=sub, temperature=args.temperature)
        )

    audio = load_wav_16k(args.audio)
    n_frames = int(round(60.0 * len(audio) / 16000))
    af = audio_features(audio, 16000, 60.0, n_frames)

    fp_source = args.first_pose or args.style[0].split(":")[0]
    fp_feats = zf.featurize_bvh_file(fp_source, fps=60)["features"]
    first = first_pose_state(fp_feats[-1])

    ratios = [float(r) for r in args.blend_ratio] if args.blend_ratio else None
    root_pos, root_rot, lpos, ltxy = gen.generate(
        af, encodings, first, blend_type=args.blend, blend_ratio=ratios
    )

    lrot = quat.from_xform(np.asarray(txform.orthogonalize_from_xy(ltxy[0])))
    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(
        args.save_dir,
        datetime.now().strftime("%Y%m%d_%H%M%S") + f"_{args.blend}.bvh",
    )
    zf.write_bvh(
        out,
        np.asarray(root_pos[0]), np.asarray(root_rot[0]),
        np.asarray(lpos[0]), np.asarray(lrot),
        zf.ZEGGS_PARENTS, zf.ZEGGS_BONE_NAMES, "zyx", 1.0 / 60.0,
    )
    print("wrote", out)


def main(argv=None):
    p = argparse.ArgumentParser(description="ZeroEGGS (ported) train/generate")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prepare")
    pp.add_argument("--source", required=True)
    pp.add_argument("--target", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("--data", required=True)
    pt.add_argument("--save_dir", required=True)
    pt.add_argument("--num_steps", type=int, default=1000)
    pt.add_argument("--batch_size", type=int, default=8)
    pt.add_argument("--window", type=int, default=60)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--hidden_size", type=int, default=512)
    pt.add_argument("--speech_encoding_size", type=int, default=128)
    pt.add_argument("--style_embedding_size", type=int, default=64)
    pt.add_argument("--num_rnn_layers", type=int, default=2)
    pt.add_argument("--style_encoder", choices=["gru", "attn"], default="gru")
    pt.add_argument("--seed", type=int, default=1234)

    pg = sub.add_parser("generate")
    pg.add_argument("--network", required=True, help="train --save_dir")
    pg.add_argument("--stats", required=True, help="prepare target stats.npz")
    pg.add_argument("--audio", required=True)
    pg.add_argument("--style", action="append", required=True,
                    help="example bvh path, optionally path:start:end; repeatable")
    pg.add_argument("--blend", choices=["add", "stitch"], default="add")
    pg.add_argument("--blend_ratio", nargs="*", default=None)
    pg.add_argument("--first_pose", default=None)
    pg.add_argument("--temperature", type=float, default=1.0)
    pg.add_argument("--seed", type=int, default=1234)
    pg.add_argument("--save_dir", default="./zeroeggs_out")

    args = p.parse_args(argv)
    {"prepare": cmd_prepare, "train": cmd_train, "generate": cmd_generate}[args.cmd](args)


if __name__ == "__main__":
    main()
