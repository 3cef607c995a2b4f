"""Shape tests for the second-wave necks (reference `tests/test_models/
test_necks.py` style)."""
import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.necks import (
    ChannelMapper, BFP, HRFPN, DilatedEncoder, SSDNeck, CTResNetNeck,
    NASFCOS_FPN, FPN_CARAFE, NASFPN)


def _feats(channels, base=32):
    rs = np.random.RandomState(0)
    return tuple(
        jnp.asarray(rs.rand(1, base // 2**i, base // 2**i, c), jnp.float32)
        for i, c in enumerate(channels))


def _run(model, feats):
    v = model.init(jax.random.PRNGKey(0), feats)
    return model.apply(v, feats)


def test_channel_mapper():
    outs = _run(ChannelMapper(in_channels=(64, 128, 256), out_channels=96,
                              kernel_size=3, num_outs=4),
                _feats((64, 128, 256)))
    assert len(outs) == 4
    assert all(o.shape[-1] == 96 for o in outs)
    assert outs[3].shape[1] == outs[2].shape[1] // 2


def test_bfp_preserves_shapes():
    feats = _feats((64, 64, 64, 64, 64))
    outs = _run(BFP(in_channels=64, num_levels=5, refine_level=2), feats)
    assert all(o.shape == f.shape for o, f in zip(outs, feats))
    outs_nl = _run(BFP(in_channels=64, num_levels=5, refine_level=2,
                       refine_type='non_local'), feats)
    assert all(o.shape == f.shape for o, f in zip(outs_nl, feats))


def test_hrfpn():
    outs = _run(HRFPN(in_channels=(18, 36, 72, 144), out_channels=96,
                      num_outs=5), _feats((18, 36, 72, 144)))
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 96)
    assert outs[4].shape == (1, 2, 2, 96)


def test_dilated_encoder_single_out():
    outs = _run(DilatedEncoder(in_channels=256, out_channels=128,
                               block_mid_channels=32),
                _feats((64, 128, 256)))
    assert len(outs) == 1
    assert outs[0].shape == (1, 8, 8, 128)


def test_ssd_neck():
    feats = _feats((96, 1280), base=16)
    outs = _run(SSDNeck(in_channels=(96, 1280),
                        out_channels=(96, 1280, 512, 256, 256, 128)),
                feats)
    assert len(outs) == 6
    assert [o.shape[-1] for o in outs] == [96, 1280, 512, 256, 256, 128]


def test_ct_resnet_neck_upsamples_to_stride4():
    feats = _feats((64, 128, 256), base=32)   # last level 8x8
    outs = _run(CTResNetNeck(in_channels=256,
                             num_deconv_filters=(64, 32, 16)), feats)
    assert len(outs) == 1
    assert outs[0].shape == (1, 64, 64, 16)   # 8 -> 64 (x8)


def test_nasfcos_fpn():
    outs = _run(NASFCOS_FPN(in_channels=(64, 128, 256), out_channels=96,
                            num_outs=5), _feats((64, 128, 256)))
    assert len(outs) == 5
    assert all(o.shape[-1] == 96 for o in outs)


def test_fpn_carafe():
    outs = _run(FPN_CARAFE(in_channels=(32, 64, 128, 256), out_channels=96,
                           num_outs=5), _feats((32, 64, 128, 256)))
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 96)


def test_nasfpn_stacked():
    outs = _run(NASFPN(in_channels=(64, 128, 256), out_channels=96,
                       stack_times=2), _feats((64, 128, 256)))
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 96)
    assert outs[4].shape == (1, 2, 2, 96)
