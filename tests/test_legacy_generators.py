"""Parity of the legacy ZeroDose-GAN generator variants + ResNet18 vs the
reference (SURVEY §2.6; VERDICT r1 item 10).

Each case builds the reference torch class with small first_num_ch, random
init, transplants the weights, and compares eval-mode outputs.  The
reference MultiAttention generator cannot be constructed under python3
(float channel count, src/model.py:1441) — asserted here; our port is
smoke-tested.  ResNet18's oracle is a hand-built torch replica of
torchvision's resnet18 (torchvision itself is unavailable offline).
"""

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from representation_disentanglement_tpu.models import (  # noqa: E402
    legacy_generators as LG)
from representation_disentanglement_tpu.utils.transplant import (  # noqa: E402
    Transplant, chw_to_hwc_perm)

B, F = 2, 8
ATOL = 2e-4


def _nhwc(a):
    return np.moveaxis(a, 1, -1)


def _nchw(a):
    return np.asarray(np.moveaxis(np.asarray(a), -1, 1))


def _tp_split_down1(t, jroot, n_split, use_ca):
    for i in range(1, n_split + 1):
        t.conv(f"down_1_{i}.0", jroot + ("split_down_1", f"down_1_{i}"),
               cond=False)
    if use_ca:
        t.linear("down_1_ca.W_down",
                 jroot + ("split_down_1", "down_1_ca", "W_down"))
        t.linear("down_1_ca.W_up",
                 jroot + ("split_down_1", "down_1_ca", "W_up"))
    t.conv("down_1_comb.0", jroot + ("split_down_1", "down_1_comb"),
           cond=False)


def _tp_downs(t, jroot, is_bn=True):
    for i in (2, 3, 4, 5):
        if is_bn:
            t.conv_bn_act_old(f"down_{i}", jroot + (f"down_{i}",))
        else:
            t.conv(f"down_{i}.conv", jroot + (f"down_{i}", "conv"),
                   cond=False)


def _tp_ups(t, jroot, is_bn=True):
    for i in (4, 3, 2, 1):
        t.conv(f"up_{i}.up.1", jroot + (f"up_{i}", "conv"), cond=False)
        if is_bn:
            t.bn(f"up_{i}.bn", jroot + (f"up_{i}", "bn"))
    t.conv("output.up.1", jroot + ("output", "conv"), cond=False)


def _tp_sgrsa(t, tname, jpath, is_bn=True):
    t.conv(f"{tname}.W_g", jpath + ("W_g",), cond=False)
    t.conv(f"{tname}.W_g_diff", jpath + ("W_g_diff",), cond=False)
    t.conv(f"{tname}.W_psi", jpath + ("W_psi",), cond=False)
    if is_bn:
        t.conv(f"{tname}.W_out.0", jpath + ("W_out_conv",), cond=False)
        t.bn(f"{tname}.W_out.1", jpath + ("W_out_bn",))
    else:
        t.conv(f"{tname}.W_out", jpath + ("W_out_conv",), cond=False)


def _tp_atts(t, jroot, kind, is_bn=True, ca_all=False):
    for i in (4, 3, 2, 1):
        if ca_all:
            t.linear(f"att_{i}_c.W_down", jroot + (f"att_{i}_c", "W_down"))
            t.linear(f"att_{i}_c.W_up", jroot + (f"att_{i}_c", "W_up"))
            sname, jname = f"att_{i}_s", f"att_{i}_s"
        else:
            sname, jname = f"att_{i}", f"att_{i}"
        if kind == "sgrsa":
            _tp_sgrsa(t, sname, jroot + (jname,), is_bn=is_bn)
        else:                    # sa / ssa / ssa_res share W_x-based names
            t.spatial_attention(sname, jroot + (jname,))


CASES = {
    "split_sa": dict(
        ref="GANShortGeneratorWithSplitInputAndSpatialAttention",
        ours=LG.GANShortGeneratorWithSplitInputAndSpatialAttention,
        in_ch=3, split=3, use_ca=False, att="sa", ca_all=False, is_bn=True),
    "ssa": dict(
        ref="GANShortGeneratorWithSymmetrySpatialAttention",
        ours=LG.GANShortGeneratorWithSymmetrySpatialAttention,
        in_ch=3, split=0, use_ca=False, att="ssa", ca_all=False, is_bn=True),
    "ssa_res": dict(
        ref="GANShortGeneratorWithSymmetryResidualSpatialAttention",
        ours=LG.GANShortGeneratorWithSymmetryResidualSpatialAttention,
        in_ch=3, split=0, use_ca=False, att="ssa", ca_all=False, is_bn=True),
    "sgrsa": dict(
        ref="GANShortGeneratorWithSymmetryGateResidualSpatialAttention",
        ours=LG.GANShortGeneratorWithSymmetryGateResidualSpatialAttention,
        in_ch=3, split=0, use_ca=False, att="sgrsa", ca_all=False,
        is_bn=True),
    "split_sgrsa": dict(
        ref="GANShortGeneratorWithSplitInputAndSymmetry"
            "GateResidualSpatialAttention",
        ours=LG.GANShortGeneratorWithSplitInputAndSymmetryGateResidualSpatialAttention,
        in_ch=3, split=3, use_ca=False, att="sgrsa", ca_all=False,
        is_bn=True),
    "split_ca_one_sa": dict(
        ref="GANShortGeneratorWithSplitInputChannelAttentionOne"
            "AndSpatialAttention",
        ours=LG.GANShortGeneratorWithSplitInputChannelAttentionOneAndSpatialAttention,
        in_ch=3, split=3, use_ca=True, att="sgrsa", ca_all=False,
        is_bn=True),
    "split_ca_all_sa": dict(
        ref="GANShortGeneratorWithSplitInputChannelAttentionAll"
            "AndSpatialAttention",
        ours=LG.GANShortGeneratorWithSplitInputChannelAttentionAllAndSpatialAttention,
        in_ch=3, split=3, use_ca=True, att="sgrsa", ca_all=True,
        is_bn=True),
    "split_ca_all_sa_nobn": dict(
        ref="GANShortGeneratorWithSplitInputChannelAttentionAll"
            "AndSpatialAttentionNoBN",
        ours=LG.GANShortGeneratorWithSplitInputChannelAttentionAllAndSpatialAttentionNoBN,
        in_ch=3, split=3, use_ca=True, att="sgrsa", ca_all=True,
        is_bn=False),
}


@pytest.mark.slow
@pytest.mark.parametrize("case", sorted(CASES), ids=sorted(CASES))
def test_legacy_generator_parity(rng, ref_model_module, case):
    c = CASES[case]
    ref_cls = getattr(ref_model_module, c["ref"])
    torch.manual_seed(11)
    tg = ref_cls(in_num_ch=c["in_ch"], out_num_ch=1, first_num_ch=F,
                 input_size=(64, 64), output_activation="no").eval()
    t = Transplant(tg.state_dict())
    if c["split"]:
        _tp_split_down1(t, (), c["split"], c["use_ca"])
    else:
        t.conv("down_1.0", ("down_1",), cond=False)
    _tp_downs(t, (), is_bn=c["is_bn"])
    _tp_ups(t, (), is_bn=c["is_bn"])
    _tp_atts(t, (), c["att"], is_bn=c["is_bn"], ca_all=c["ca_all"])

    x = rng.random((B, c["in_ch"], 64, 64)).astype(np.float32)
    with torch.no_grad():
        want, alphas_t = tg(torch.tensor(x))
    jg = c["ours"](out_num_ch=1, first_num_ch=F, output_activation="no")
    got, alphas = jg.apply({"params": t.params, "batch_stats": t.stats},
                           _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw(got), want.numpy(), atol=5e-4)
    if alphas_t:
        for k in ("alpha_1", "alpha_4"):
            np.testing.assert_allclose(_nchw(alphas[k]),
                                       alphas_t[k].numpy(), atol=ATOL)


@pytest.mark.slow
def test_standard_split_ca_one_parity(rng, ref_model_module):
    """8-down pix2pix with 4-way split input + SE (src/model.py:473-548).
    Needs 256x256 input for the 1x1 bottleneck."""
    ref_cls = ref_model_module.GANStandardGeneratorWithSplitInputChannelAttentionOne
    torch.manual_seed(12)
    tg = ref_cls(in_num_ch=4, out_num_ch=1, first_num_ch=4,
                 input_size=(256, 256), output_activation="no").eval()
    t = Transplant(tg.state_dict())
    _tp_split_down1(t, (), 4, use_ca=True)
    for i in range(2, 9):
        t.conv_bn_act_old(f"down_{i}", (f"down_{i}",))
    for i in range(7, 0, -1):
        t.conv(f"up_{i}.up.1", (f"up_{i}", "conv"), cond=False)
        t.bn(f"up_{i}.bn", (f"up_{i}", "bn"))
    t.conv("output.up.1", ("output", "conv"), cond=False)

    x = rng.random((1, 4, 256, 256)).astype(np.float32)
    with torch.no_grad():
        want, _ = tg(torch.tensor(x))
    jg = LG.GANStandardGeneratorWithSplitInputChannelAttentionOne(
        out_num_ch=1, first_num_ch=4, output_activation="no")
    got, _ = jg.apply({"params": t.params, "batch_stats": t.stats},
                      _nhwc(x), train=False)
    np.testing.assert_allclose(_nchw(got), want.numpy(), atol=5e-4)


def test_multiattention_ref_broken_ours_runs(rng, ref_model_module):
    """The reference MultiAttention generator crashes on construction under
    python3 (float channel count, src/model.py:1441); our port runs."""
    with pytest.raises(TypeError):
        ref_model_module.GANShortGeneratorWithSplitInputMultiAttentionAll(
            in_num_ch=3, out_num_ch=1, first_num_ch=32)
    jg = LG.GANShortGeneratorWithSplitInputMultiAttentionAll(
        out_num_ch=1, first_num_ch=16, output_activation="no")
    # the 8x8 avg-pooled channel gate needs d4 >= 8x8, i.e. input >= 128
    # (the reference's intended input_size is 256, src/model.py:1229)
    x = np.zeros((1, 128, 128, 3), np.float32)
    vs = jg.init(jax.random.PRNGKey(0), x, train=False)
    out, alphas = jg.apply(vs, x, train=False)
    assert out.shape == (1, 128, 128, 1) and "alpha_1" in alphas


def test_split8_layout_smoke():
    """The 8-channel stroke split layout builds and runs (src/model.py:851)."""
    jg = LG.GANShortGeneratorWithSplitInputChannelAttentionAllAndSpatialAttention(
        out_num_ch=1, in_num_ch=8, first_num_ch=8, output_activation="no")
    x = np.zeros((1, 64, 64, 8), np.float32)
    vs = jg.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = jg.apply(vs, x, train=False)
    assert out.shape == (1, 64, 64, 1)


@pytest.mark.slow
def test_resnet18_parity(rng):
    """ResNet18 (src/model.py:1591-1601) vs a hand-built torch replica of
    torchvision's resnet18 with fc -> Linear(512, 1) + sigmoid."""
    import torch.nn as tnn

    class TBasic(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            h = torch.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return torch.relu(h + idn)

    class TResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            for s, (cin, cout, st) in enumerate(
                    [(64, 64, 1), (64, 128, 2), (128, 256, 2),
                     (256, 512, 2)], start=1):
                setattr(self, f"layer{s}", tnn.Sequential(
                    TBasic(cin, cout, st), TBasic(cout, cout, 1)))
            self.fc = tnn.Linear(512, 1)

        def forward(self, x):
            h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for s in (1, 2, 3, 4):
                h = getattr(self, f"layer{s}")(h)
            h = h.mean((2, 3))
            return torch.sigmoid(self.fc(h))

    from representation_disentanglement_tpu.models.resnet import (
        ResNet18, load_resnet18_params)
    torch.manual_seed(5)
    tm = TResNet18().eval()
    # randomize BN running stats so the transplant is actually exercised
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.4)
    params, stats = load_resnet18_params(tm.state_dict())
    x = rng.random((2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    got = ResNet18().apply({"params": params, "batch_stats": stats},
                           _nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
