"""diffusers-layout config loading (pipeline_config_from_pretrained).

Every entry point that takes --model_path goes through this loader
(scripts/inference.py, train/trainer.py, prepare_sft_ckpt, parity_check).
Round-trips a config directory written from a known PipelineConfig and
checks diffusers-style extras (unknown keys, list-vs-tuple fields) are
handled the way real checkpoint configs exercise them.
"""

import dataclasses
import json

from dove_tpu.config import pipeline_config_from_pretrained, tiny_test


def _write_dir(tmp_path, dit_raw, vae_raw, sched_raw):
    for sub, name, raw in [
        ("transformer", "config.json", dit_raw),
        ("vae", "config.json", vae_raw),
        ("scheduler", "scheduler_config.json", sched_raw),
    ]:
        d = tmp_path / sub
        d.mkdir(exist_ok=True)
        (d / name).write_text(json.dumps(raw))


def test_roundtrip_with_diffusers_extras(tmp_path):
    ref = tiny_test()
    dit_raw = dataclasses.asdict(ref.dit)
    vae_raw = dataclasses.asdict(ref.vae)
    sched_raw = dataclasses.asdict(ref.scheduler)
    # diffusers configs carry keys our dataclasses don't model, and JSON
    # turns tuples into lists — both must be absorbed
    dit_raw.update({"_class_name": "CogVideoXTransformer3DModel",
                    "_diffusers_version": "0.31.0",
                    "dropout": 0.0})
    vae_raw["block_out_channels"] = list(vae_raw["block_out_channels"])
    vae_raw["_class_name"] = "AutoencoderKLCogVideoX"
    sched_raw["_class_name"] = "CogVideoXDPMScheduler"
    _write_dir(tmp_path, dit_raw, vae_raw, sched_raw)

    cfg = pipeline_config_from_pretrained(tmp_path)
    assert cfg.dit == ref.dit
    assert cfg.vae == ref.vae  # incl. tuple-restored block_out_channels
    assert isinstance(cfg.vae.block_out_channels, tuple)
    assert cfg.scheduler == ref.scheduler
