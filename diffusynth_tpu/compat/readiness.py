"""One-command real-weights readiness drill (VERDICT r4 task 7).

No pretrained reference checkpoint is reachable in this environment (no
network, no .pth on disk — benchmarks/RESULTS_r4.md section 3), but the
day the HF weights (reference README.md:33) appear, this is the tested
happy path:

  python -m diffusynth_tpu.compat.readiness --pth-dir models --out models_jax

Stages (JSON report on stdout; nonzero exit if any stage fails):

  1. discover  — find .pth files by the reference's fixed filename
                 convention {name}_{imageVQVAE|UNet|MMM|timbre_encoder}.pth
                 (reference: VQGAN.py:583, diffusion.py:373,
                 timbre_encoder_pretrain.py:247, multimodal_model.py:337).
  2. convert   — torch state_dict -> flax orbax per role
                 (compat/torch_convert.py via convert_cli.convert).
  3. parity    — forward-parity of each converted model against the
                 in-process torch reference built from the SAME config
                 (compat/reference_env.py shims; skipped per-role with a
                 note when /root/reference is unavailable).
  4. serve     — boot the real HTTP server from the converted checkpoint
                 dir and serve one text2sound request end to end.

Exercised end to end by tests/test_readiness.py with synthesized torch
checkpoints saved by the in-process reference models.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np

# Reference filename suffix -> converter role (convert_cli.convert).
ROLE_SUFFIXES = {
    "imageVQVAE": "vqgan",
    "UNet": "unet",
    "timbre_encoder": "timbre",
    "MMM": "mmm",
}
# Forward-parity budget (f32, same weights both sides): the compat tests
# pin conversions at ~1e-5; 1e-3 here matches the BASELINE spectrogram
# MAE budget with headroom for bigger configs.
PARITY_BUDGET = 1e-3


def discover(pth_dir: str) -> Dict[str, Dict[str, str]]:
    """Map role -> {"path", "name"} for every recognizable .pth file."""
    found: Dict[str, Dict[str, str]] = {}
    for f in sorted(os.listdir(pth_dir)):
        if not f.endswith(".pth"):
            continue
        stem = f[:-4]
        for suffix, role in ROLE_SUFFIXES.items():
            if stem.endswith("_" + suffix):
                found[role] = {
                    "path": os.path.join(pth_dir, f),
                    "name": stem[: -(len(suffix) + 1)],
                }
    return found


def _torch_vqgan(cfg):
    """Reference VQGAN from our config (kwargs mirror app.py:32-35)."""
    from model.VQGAN import VQGAN as TorchVQGAN

    v = cfg.vqgan
    return TorchVQGAN(
        in_channels=v.in_channels, hidden_channels=list(v.hidden_channels),
        embedding_dim=v.embedding_dim, out_channels=v.out_channels,
        block_depth=v.block_depth, attn_pos=list(v.attn_pos),
        attn_with_skip=v.attn_with_skip, num_embeddings=v.num_embeddings,
        commitment_cost=v.commitment_cost, decay=v.decay,
        norm_type=v.norm_type, act_type=v.act_type,
        num_groups=v.num_groups).eval()


def _torch_unet(cfg):
    """Reference ConditionedUnet from our config (app.py:40 kwargs)."""
    from model.diffusion import ConditionedUnet as TorchUnet

    u = cfg.unet
    return TorchUnet(
        in_dim=u.in_dim, down_dims=list(u.down_dims),
        up_dims=list(u.up_dims), attn_type=u.attn_type,
        condition_type=u.condition_type,
        label_emb_dim=u.label_emb_dim).eval()


def _torch_timbre(cfg):
    """Reference TimbreEncoder from our config (app.py:47-49 kwargs)."""
    from model.timbre_encoder_pretrain import TimbreEncoder as TorchTE

    t = cfg.timbre
    return TorchTE(
        input_dim=t.input_dim, feature_dim=t.feature_dim,
        hidden_dim=t.hidden_dim,
        num_instrument_classes=t.num_instrument_classes,
        num_instrument_family_classes=t.num_instrument_family_classes,
        num_velocity_classes=t.num_velocity_classes,
        num_qualities=t.num_qualities, num_layers=t.num_layers).eval()


def _parity(role: str, pth_path: str, out_dir: str, name: str,
            cfg) -> Dict:
    """Forward max|diff| between the converted flax model and the torch
    reference loaded with the same state_dict."""
    import torch

    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.compat import load_reference_checkpoint
    from diffusynth_tpu.compat.reference_env import setup_reference_imports
    from diffusynth_tpu.train.checkpoints import Checkpointer

    setup_reference_imports()
    state_dict = load_reference_checkpoint(pth_path)
    ckpt = Checkpointer(out_dir)
    rng = np.random.default_rng(0)

    def nchw(x):
        return torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))

    if role == "vqgan":
        from diffusynth_tpu.nn.vqgan import VQGAN

        a = cfg.audio
        x = rng.standard_normal(
            (1, a.freq_resolution, a.time_resolution, 3)).astype(np.float32)
        fmodel = VQGAN(cfg.vqgan)
        template = jax.jit(fmodel.init)(jax.random.key(0), jnp.asarray(x))
        variables = ckpt.restore(name, "imageVQVAE",
                                 {"variables": template, "step": 0}
                                 )["variables"]
        _, frec, _ = fmodel.apply(variables, jnp.asarray(x))
        tmodel = _torch_vqgan(cfg)
        tmodel.load_state_dict(state_dict)
        with torch.no_grad():
            _, trec, _ = tmodel(nchw(x))
        diff = float(np.max(np.abs(
            np.asarray(frec, np.float32)
            - np.transpose(trec.numpy(), (0, 2, 3, 1)))))
    elif role == "unet":
        from diffusynth_tpu.nn.unet import ConditionedUnet

        a = cfg.audio
        x = rng.standard_normal(
            (1, a.latent_height, 8, a.channels)).astype(np.float32)
        c = rng.standard_normal(
            (1, cfg.unet.label_emb_dim)).astype(np.float32)
        fmodel = ConditionedUnet(cfg.unet)
        template = jax.jit(fmodel.init)(
            jax.random.key(0), jnp.asarray(x), jnp.zeros(1, jnp.int32),
            jnp.asarray(c))
        variables = ckpt.restore(name, "UNet",
                                 {"variables": template, "step": 0}
                                 )["variables"]
        fout = fmodel.apply(variables, jnp.asarray(x),
                            jnp.asarray([5], jnp.int32), jnp.asarray(c))
        tmodel = _torch_unet(cfg)
        tmodel.load_state_dict(state_dict)
        with torch.no_grad():
            tout = tmodel(nchw(x), torch.tensor([5]),
                          torch.from_numpy(c))
        diff = float(np.max(np.abs(
            np.asarray(fout, np.float32)
            - np.transpose(tout.numpy(), (0, 2, 3, 1)))))
    elif role == "timbre":
        from diffusynth_tpu.nn.timbre import TimbreEncoder

        a = cfg.audio
        x = rng.standard_normal(
            (1, a.latent_height, 8, a.channels)).astype(np.float32)
        fmodel = TimbreEncoder(cfg.timbre)
        template = jax.jit(fmodel.init)(jax.random.key(0), jnp.asarray(x))
        variables = ckpt.restore(name, "timbre_encoder",
                                 {"variables": template, "step": 0}
                                 )["variables"]
        fout = fmodel.apply(variables, jnp.asarray(x))[0]  # feature head
        tmodel = _torch_timbre(cfg)
        tmodel.load_state_dict(state_dict)
        with torch.no_grad():
            # Reference forward expects the latent viewed as (B, 512, W)
            # (timbre_encoder_pretrain.py:64-71): ours takes NHWC and
            # reshapes internally with matching semantics.
            tout = tmodel(nchw(x))[0]
        diff = float(np.max(np.abs(np.asarray(fout, np.float32)
                                   - tout.numpy())))
    else:
        return {"status": "skipped",
                "note": "MMM text-projection parity is covered by "
                        "tests/test_compat.py (needs a CLAP instance)"}
    status = "ok" if diff < PARITY_BUDGET else "FAIL"
    return {"status": status, "forward_max_diff": diff}


def _serve_check(out_dir: str, found: Dict, cfg, steps: int = 3) -> Dict:
    """Boot the real HTTP server from the converted checkpoints and serve
    one text2sound request."""
    import base64
    import io
    import threading
    import urllib.request

    from scipy.io import wavfile

    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.serving.server import make_server

    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

    # Text encoder dim must match the U-Net's label_emb_dim; the hash
    # stand-in keeps the drill self-contained (the production MMM/CLAP
    # encoder plugs into the same slot when its weights are converted —
    # text/clap_flax.py + compat/torch_convert.py).
    runtime = DiffuSynthRuntime.from_pretrained(
        out_dir,
        vqgan_name=found.get("vqgan", {}).get("name", "vqgan"),
        unet_name=found.get("unet", {}).get("name", "unet"),
        config=cfg,
        text_encoder=CachedTextEncoder(
            HashTextEncoder(cfg.unet.label_emb_dim)))
    server = make_server("127.0.0.1", 0, runtime=runtime)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"prompt": "readiness drill", "duration_sec": 1.0,
                           "steps": steps, "cfg": 3.0, "seed": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/text2sound", data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=900) as resp:
                out = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return {"status": "FAIL",
                    "error": f"HTTP {e.code}: {e.read().decode()[:500]}"}
        sr, wave = wavfile.read(
            io.BytesIO(base64.b64decode(out["audio_b64"])))
        ok = sr == cfg.audio.sample_rate and len(wave) > 0 \
            and np.isfinite(wave.astype(np.float32)).all()
        return {"status": "ok" if ok else "FAIL",
                "sample_rate": int(sr), "samples": int(len(wave))}
    finally:
        server.shutdown()
        server.app.batcher.stop()


def run_drill(pth_dir: str, out_dir: str, config=None,
              parity: bool = True, serve: bool = True,
              steps: int = 3) -> Dict:
    """Full drill; returns the report dict (see module docstring)."""
    from diffusynth_tpu.compat.convert_cli import convert
    from diffusynth_tpu.configs import AppConfig

    cfg = config or AppConfig()
    found = discover(pth_dir)
    report: Dict = {"pth_dir": os.path.abspath(pth_dir),
                    "out_dir": os.path.abspath(out_dir),
                    "found": {r: v["path"] for r, v in found.items()},
                    "converted": {}, "parity": {}, "serve": None}
    if not found:
        report["status"] = "FAIL"
        report["error"] = (f"no recognizable .pth files in {pth_dir} "
                           f"(expected *_{{{'|'.join(ROLE_SUFFIXES)}}}.pth)")
        return report

    for role, info in found.items():
        convert(role, info["path"], out_dir, info["name"], config=cfg)
        report["converted"][role] = f"{out_dir}/{info['name']}"

    if parity:
        ref_ok = os.path.isdir("/root/reference/model")
        for role, info in found.items():
            if not ref_ok:
                report["parity"][role] = {
                    "status": "skipped", "note": "reference not mounted"}
                continue
            report["parity"][role] = _parity(
                role, info["path"], out_dir, info["name"], cfg)

    if serve:
        if "vqgan" in found and "unet" in found:
            report["serve"] = _serve_check(out_dir, found, cfg, steps=steps)
        else:
            report["serve"] = {
                "status": "skipped",
                "note": "need both *_imageVQVAE.pth and *_UNet.pth to "
                        "boot generation"}

    failed = [r for r, v in report["parity"].items()
              if v.get("status") == "FAIL"]
    if report["serve"] and report["serve"].get("status") == "FAIL":
        failed.append("serve")
    report["status"] = "FAIL" if failed else "ok"
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pth-dir", required=True,
                        help="directory of reference .pth checkpoints")
    parser.add_argument("--out", default="models_jax",
                        help="orbax output dir")
    parser.add_argument("--steps", type=int, default=3,
                        help="sampler steps for the serve check")
    parser.add_argument("--no-parity", action="store_true")
    parser.add_argument("--no-serve", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU platform (f32 parity numbers; "
                             "without it the serve check exercises the "
                             "real TPU path, compiles and all)")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    report = run_drill(args.pth_dir, args.out, parity=not args.no_parity,
                       serve=not args.no_serve, steps=args.steps)
    print(json.dumps(report, indent=2))
    raise SystemExit(0 if report["status"] == "ok" else 1)


if __name__ == "__main__":
    main()
