"""Typed config schemas round-trip and match the reference kwargs."""
from mri_epilepsy_diagnosis_tpu.core.config import (CVConfig, DataConfig,
                                                    FaderConfig,
                                                    SegTrainingConfig,
                                                    from_json, to_json)


def test_config_roundtrip():
    import dataclasses
    import json

    for cls in [DataConfig, SegTrainingConfig, CVConfig, FaderConfig]:
        cfg = cls()
        restored = from_json(cls, to_json(cfg))
        # JSON normalizes tuples to lists; compare through the JSON form
        assert (json.loads(to_json(restored))
                == json.loads(json.dumps(dataclasses.asdict(cfg))))


def test_fader_config_matches_notebook_schema():
    cfg = FaderConfig()
    assert cfg.ae_kwargs["down_block_kwargs"]["conv_k"] == 6
    assert cfg.discriminator_kwargs["n_domains"] == 18
    assert cfg.classificator_kwargs["n_class"] == 2
    assert cfg.lambda_final == 1e-1 and cfg.max_step == 300


def test_fader_config_builds_models():
    import jax
    import jax.numpy as jnp

    from mri_epilepsy_diagnosis_tpu.models import Classificator, Discriminator
    from mri_epilepsy_diagnosis_tpu.models.fader import make_encoder

    cfg = FaderConfig()
    enc = make_encoder(cfg.ae_kwargs)
    disc = Discriminator(**cfg.discriminator_kwargs)
    clf = Classificator(**cfg.classificator_kwargs)
    v = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 64, 1)))
    latent, sizes = enc.apply(v, jnp.zeros((1, 64, 64, 64, 1)))
    assert latent.shape[-1] == 32 and len(sizes) == 3
