"""8-bit serving transfers (VERDICT r4 #4): the uint8 affine-quantized
upload must produce masks in >= 0.999 agreement with the int16 path —
the int8-PTQ gate pattern applied to the transfer leg."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri_epilepsy_diagnosis_tpu.infer.serving import (_quantize_u8,
                                                      segment_volumes)
from mri_epilepsy_diagnosis_tpu.models import UNet3D
from mri_epilepsy_diagnosis_tpu.transforms import znormalization


def _znorm_batch(batch):
    return jax.vmap(lambda vol: znormalization(
        vol[..., 0].astype(jnp.float32))[..., None])(batch)


def test_quantize_u8_roundtrip():
    rng = np.random.default_rng(0)
    v = (rng.normal(size=(8, 8, 8, 1)) * 300 + 700).astype(np.int16)
    q, aff = _quantize_u8(v)
    assert q.dtype == np.uint8 and aff.shape == (2,)
    rec = q.astype(np.float32) * aff[1] + aff[0]
    # worst-case rounding error is half a quantization step
    step = aff[1]
    assert np.abs(rec - v.astype(np.float32)).max() <= 0.5 * step + 1e-4

    flat = np.zeros((4, 4, 4, 1), np.float32)  # constant volume: scale guard
    q0, aff0 = _quantize_u8(flat)
    assert aff0[1] == 1.0 and (q0 == 0).all()


def test_uint8_transfer_mask_agreement():
    rng = np.random.default_rng(1)
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=2,
                   out_channels_first_layer=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    # T1w-like smooth volumes: blobs + noise on an int16 intensity scale
    vols = []
    for _ in range(4):
        v = rng.normal(size=(16, 16, 16)) * 40 + 600
        c = rng.integers(4, 12, 3)
        g = np.indices((16, 16, 16))
        blob = 400 * np.exp(-(((g[0] - c[0]) ** 2 + (g[1] - c[1]) ** 2
                               + (g[2] - c[2]) ** 2) / 18.0))
        vols.append((v + blob).astype(np.int16))

    ref = list(segment_volumes(model.apply, variables, vols, batch_size=2,
                               dtype=jnp.float32, transfer_dtype=np.int16,
                               device_preprocess=_znorm_batch))
    got = list(segment_volumes(model.apply, variables, vols, batch_size=2,
                               dtype=jnp.float32, transfer_quant="uint8",
                               device_preprocess=_znorm_batch,
                               pack_masks=True))
    agree = np.mean([np.mean(r["mask"] == g["mask"])
                     for r, g in zip(ref, got)])
    assert agree >= 0.999, f"mask agreement {agree}"


def test_transfer_quant_validation():
    model = UNet3D(in_channels=1, out_classes=2, num_encoding_blocks=2,
                   out_channels_first_layer=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)))
    vols = [np.zeros((8, 8, 8), np.float32)]
    with pytest.raises(ValueError, match="unknown transfer_quant"):
        list(segment_volumes(model.apply, variables, vols,
                             transfer_quant="int4"))
    with pytest.raises(ValueError, match="replaces transfer_dtype"):
        list(segment_volumes(model.apply, variables, vols,
                             transfer_quant="uint8",
                             transfer_dtype=np.int16))
