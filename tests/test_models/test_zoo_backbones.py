"""Shape/grad smoke tests for the second-wave backbones, mirroring the
reference's per-backbone tests (`tests/test_models/test_backbones/`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_domain_adaptation_object_detection_implementation_tpu.models.backbones import (
    Res2Net, RegNet, ResNeSt, SSDVGG, HRNet, PVT, HourglassNet,
    regnet_widths)


def _run(model, shape=(1, 64, 64, 3), **kwargs):
    x = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    return model.apply(variables, x, **kwargs), variables


class TestRes2Net:
    def test_stage_shapes(self):
        m = Res2Net(depth=50)
        outs, _ = _run(m)
        assert len(outs) == 4
        assert outs[0].shape == (1, 16, 16, 256)
        assert outs[3].shape == (1, 2, 2, 2048)
        assert m.stage_channels() == (256, 512, 1024, 2048)


class TestRegNet:
    def test_width_quantization(self):
        widths, depths = regnet_widths(88, 26.31, 2.25, 25, 48)
        assert len(widths) == 4
        assert sum(depths) == 25
        assert all(w % 8 == 0 for w in widths)

    def test_forward(self):
        m = RegNet(arch='regnetx_400mf')
        outs, _ = _run(m)
        assert len(outs) == 4
        assert tuple(o.shape[-1] for o in outs) == m.stage_channels()
        assert outs[0].shape[1] == 16     # stride 4


class TestResNeSt:
    def test_forward_and_split_attention(self):
        m = ResNeSt(depth=50)
        outs, _ = _run(m)
        assert outs[0].shape == (1, 16, 16, 256)
        assert outs[3].shape == (1, 2, 2, 2048)


class TestSSDVGG:
    def test_ssd300_pyramid(self):
        m = SSDVGG()
        outs, _ = _run(m, shape=(1, 300, 300, 3))
        assert [o.shape[1] for o in outs] == [38, 19, 10, 5, 3, 1]
        assert tuple(o.shape[-1] for o in outs) == m.stage_channels()

    def test_l2norm_applied(self):
        m = SSDVGG(l2_scale=20.0)
        outs, variables = _run(m, shape=(1, 64, 64, 3))
        # conv4_3 output rows are L2-normalized * scale: per-pixel norm ≈ 20
        n = np.linalg.norm(np.asarray(outs[0])[0, 0, 0])
        assert abs(n - 20.0) < 2.0


class TestHRNet:
    def test_four_branch_output(self):
        m = HRNet(base_width=18, num_modules=(1, 1, 1))  # slim for test
        outs, _ = _run(m)
        assert len(outs) == 4
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
        assert [o.shape[-1] for o in outs] == [18, 36, 72, 144]


class TestPVT:
    def test_v1_pyramid(self):
        m = PVT(depths=(1, 1, 1, 1))
        outs, _ = _run(m)
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
        assert [o.shape[-1] for o in outs] == [64, 128, 320, 512]

    def test_v2_linear(self):
        m = PVT(depths=(1, 1, 1, 1), v2=True, linear=True)
        outs, _ = _run(m)
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


class TestHourglass:
    def test_stacked_outputs(self):
        m = HourglassNet(downsample_times=3, num_stacks=2,
                         stage_channels=(64, 64, 96, 96),
                         stage_blocks=(1, 1, 1, 1), feat_channel=64)
        outs, _ = _run(m)
        assert len(outs) == 2
        # stride 4 with equal output sizes per stack
        assert outs[0].shape == (1, 16, 16, 64)
        assert outs[1].shape == (1, 16, 16, 64)


def test_gradients_flow():
    m = Res2Net(depth=50)
    x = jnp.ones((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        outs = m.apply({'params': params,
                        'batch_stats': variables['batch_stats']}, x)
        return sum(jnp.sum(o) for o in outs)

    g = jax.grad(loss)(variables['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
