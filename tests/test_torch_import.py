"""Reference-checkpoint migration: a torch UNet state dict in the
reference's exact key layout (reference unet/unet.py:67-105) must
convert into flax variables whose eval-mode forward matches a functional
torch oracle reconstructed from the same state dict."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from image_segmentation_tpu.models import UNet  # noqa: E402
from image_segmentation_tpu.models.torch_import import (  # noqa: E402
    convert_torch_unet_state_dict,
)

BASE = 8  # reference trains 64; the layout is identical at any base


def _reference_layout_state_dict(seed=0, din=3, dout=4):
    """Random-valued state dict with the reference's key names/shapes
    (down1.doubleConvReLU.*, downK.maxpool_doubleConv.1.*, upK.*,
    output.*)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(prefix, cout, cin, k):
        # fan-in scaling keeps activations O(1) through all 9 levels —
        # ill-conditioned random weights make activations (and thus pure
        # float-rounding noise) blow up exponentially with depth
        s = (cin * k * k) ** -0.5
        sd[prefix + ".weight"] = torch.randn(cout, cin, k, k, generator=g) * s
        sd[prefix + ".bias"] = torch.randn(cout, generator=g) * 0.1

    def bn(prefix, c):
        sd[prefix + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[prefix + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[prefix + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[prefix + ".running_var"] = torch.rand(c, generator=g) + 0.5
        sd[prefix + ".num_batches_tracked"] = torch.tensor(7)

    def double(prefix, cin, cout):
        conv(prefix + ".0", cout, cin, 3)
        bn(prefix + ".1", cout)
        conv(prefix + ".3", cout, cout, 3)
        bn(prefix + ".4", cout)

    b = BASE
    double("down1.doubleConvReLU", din, b)
    chans = [b, 2 * b, 4 * b, 8 * b, 16 * b]
    for k in range(2, 6):
        double(f"down{k}.maxpool_doubleConv.1.doubleConvReLU",
               chans[k - 2], chans[k - 1])
    for k in range(1, 5):
        cin, cout = chans[5 - k], chans[4 - k]
        # ConvTranspose2d weight is (in, out, kH, kW)
        sd[f"up{k}.upsample.weight"] = (
            torch.randn(cin, cout, 2, 2, generator=g) * cin**-0.5
        )
        sd[f"up{k}.upsample.bias"] = torch.randn(cout, generator=g) * 0.1
        double(f"up{k}.doubleConv.doubleConvReLU", cin, cout)
    conv("output", dout, b, 1)
    return sd


def _oracle_forward(sd, x_nchw):
    """Eval-mode forward computed with torch functional ops directly from
    the state dict (oracle for the reference architecture's math)."""

    def dc(x, p):
        for c, n in ((0, 1), (3, 4)):
            x = F.conv2d(x, sd[f"{p}.{c}.weight"], sd[f"{p}.{c}.bias"],
                         padding=1)
            x = F.batch_norm(
                x, sd[f"{p}.{n}.running_mean"], sd[f"{p}.{n}.running_var"],
                sd[f"{p}.{n}.weight"], sd[f"{p}.{n}.bias"],
                training=False, eps=1e-5,
            )
            x = F.relu(x)
        return x

    x1 = dc(x_nchw, "down1.doubleConvReLU")
    xs = [x1]
    for k in range(2, 6):
        xs.append(dc(F.max_pool2d(xs[-1], 2),
                     f"down{k}.maxpool_doubleConv.1.doubleConvReLU"))
    y = xs[4]
    for k, skip in zip(range(1, 5), (xs[3], xs[2], xs[1], xs[0])):
        up = F.conv_transpose2d(y, sd[f"up{k}.upsample.weight"],
                                sd[f"up{k}.upsample.bias"], stride=2)
        y = dc(torch.cat([skip, up], 1), f"up{k}.doubleConv.doubleConvReLU")
    return F.conv2d(y, sd["output.weight"], sd["output.bias"])


def test_converted_forward_matches_torch_oracle():
    sd = _reference_layout_state_dict()
    variables = convert_torch_unet_state_dict(sd)

    with torch.no_grad():
        x = torch.rand(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
        want = _oracle_forward(sd, x).numpy().transpose(0, 2, 3, 1)

    model = UNet(num_classes=4, base=BASE)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, variables), x_nhwc, train=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_accepts_full_checkpoint_wrapper():
    """The reference saves {'model_state_dict': ...} full checkpoints
    (utils/training.py:564-609); bare MO_ dicts work too."""
    sd = _reference_layout_state_dict()
    a = convert_torch_unet_state_dict(sd)
    b = convert_torch_unet_state_dict({"model_state_dict": sd, "epoch": 3})
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


def test_converted_tree_matches_unet_init():
    """Converted names AND shapes must equal UNet.init's exactly — a
    loadability guarantee independent of the numerics."""
    import flax

    variables = convert_torch_unet_state_dict(_reference_layout_state_dict())
    init = UNet(num_classes=4, base=BASE).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    for col in ("params", "batch_stats"):
        got = {
            k: np.asarray(v).shape
            for k, v in flax.traverse_util.flatten_dict(
                variables[col], sep="/"
            ).items()
        }
        want = {
            k: np.asarray(v).shape
            for k, v in flax.traverse_util.flatten_dict(
                init[col], sep="/"
            ).items()
        }
        assert got == want, col


@pytest.mark.slow
def test_conversion_script_to_servable_artifact(tmp_path):
    """Drive scripts/convert_unet_weights.py on a saved reference-style
    .pth (full-checkpoint wrapper) and check the produced weights-only
    artifact restores into an eval forward matching the torch oracle —
    i.e. the artifact is directly servable (serve/app.py loads the same
    format via load_variables_only)."""
    import sys

    sys.path.insert(0, ".")
    from scripts.convert_unet_weights import main as convert_main

    from image_segmentation_tpu.train.checkpoint import load_variables_only

    sd = _reference_layout_state_dict(seed=2)
    pth = str(tmp_path / "ref_ckpt.pth")
    torch.save({"model_state_dict": sd, "epoch": 12, "best_dev_miou": 0.7}, pth)
    out = str(tmp_path / "MO_unet")
    convert_main(["--torch-checkpoint", pth, "--out", out])

    variables = load_variables_only(out)
    assert "batch_stats" in variables
    with torch.no_grad():
        x = torch.rand(2, 3, 64, 64, generator=torch.Generator().manual_seed(3))
        want = _oracle_forward(sd, x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        UNet(num_classes=4, base=BASE).apply(
            jax.tree.map(jnp.asarray, variables),
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def _ae_state_dict(seg: bool, seed=0):
    """Reference autoencoder state dict: SegmentationAutoencoder keys
    (encoder.encoder.encoderPartK / decoder.decoderBlockK / finalConv) or
    ReconstructionAutoencoder keys (encoder.encoderPartK / decoderOut.0)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    b = BASE

    def conv(prefix, cout, cin, k, bias=True):
        s = (cin * k * k) ** -0.5
        sd[prefix + ".weight"] = torch.randn(cout, cin, k, k, generator=g) * s
        if bias:
            sd[prefix + ".bias"] = torch.randn(cout, generator=g) * 0.1

    def bn(prefix, c):
        sd[prefix + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[prefix + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[prefix + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[prefix + ".running_var"] = torch.rand(c, generator=g) + 0.5
        sd[prefix + ".num_batches_tracked"] = torch.tensor(5)

    enc = "encoder.encoder" if seg else "encoder"
    chans = [(3, b), (b, 2 * b), (2 * b, 4 * b)]
    for k, (cin, cout) in enumerate(chans, 1):
        conv(f"{enc}.encoderPart{k}.conv1", cout, cin, 3, bias=False)
        bn(f"{enc}.encoderPart{k}.bn1", cout)
        conv(f"{enc}.encoderPart{k}.conv2", cout, cout, 3, bias=False)
        bn(f"{enc}.encoderPart{k}.bn2", cout)
    # decoder blocks: (din_up, din_skip, dout)
    blocks = ([(4 * b, 4 * b, 2 * b), (2 * b, 2 * b, b), (b, b, b)] if seg
              else [(4 * b, 0, 2 * b), (2 * b, 0, b), (b, 0, b)])
    for k, (din, dskip, dout) in enumerate(blocks, 1):
        p = f"decoder.decoderBlock{k}"
        sd[f"{p}.up.weight"] = torch.randn(din, dout, 2, 2, generator=g) * din**-0.5
        sd[f"{p}.up.bias"] = torch.randn(dout, generator=g) * 0.1
        cin = dout + dskip
        conv(f"{p}.convs.0", dout, cin, 3, bias=False)
        bn(f"{p}.convs.1", dout)
        conv(f"{p}.convs.3", dout, dout, 3, bias=False)
        bn(f"{p}.convs.4", dout)
    if seg:
        conv("finalConv", 4, b, 1)
    else:
        conv("decoderOut.0", 3, b, 3)
    return sd


def _ae_oracle_forward(sd, x, seg: bool):
    def cbr(x, cp, bp):
        x = F.conv2d(x, sd[cp + ".weight"], None, padding=1)
        x = F.batch_norm(x, sd[bp + ".running_mean"], sd[bp + ".running_var"],
                         sd[bp + ".weight"], sd[bp + ".bias"],
                         training=False, eps=1e-5)
        return F.relu(x)

    enc = "encoder.encoder" if seg else "encoder"
    skips = []
    h = x
    for k in range(1, 4):
        p = f"{enc}.encoderPart{k}"
        h = cbr(h, p + ".conv1", p + ".bn1")
        skip = cbr(h, p + ".conv2", p + ".bn2")
        skips.append(skip)
        h = F.max_pool2d(skip, 2)
    y = h  # bottleneck (after pool of part3 -- reference pools every block)
    for k, skip in zip(range(1, 4), (skips[2], skips[1], skips[0])):
        p = f"decoder.decoderBlock{k}"
        y = F.conv_transpose2d(y, sd[p + ".up.weight"], sd[p + ".up.bias"],
                               stride=2)
        if seg:
            y = torch.cat([y, skip], 1)
        y = cbr(y, p + ".convs.0", p + ".convs.1")
        y = cbr(y, p + ".convs.3", p + ".convs.4")
    if seg:
        return F.conv2d(y, sd["finalConv.weight"], sd["finalConv.bias"])
    out = F.conv2d(y, sd["decoderOut.0.weight"], sd["decoderOut.0.bias"],
                   padding=1)
    return torch.sigmoid(out)


@pytest.mark.parametrize("seg", [True, False])
def test_autoencoder_conversion_matches_oracle(seg):
    from image_segmentation_tpu.models import (
        ReconstructionAutoencoder,
        SegmentationAutoencoder,
    )
    from image_segmentation_tpu.models.torch_import import (
        convert_torch_autoencoder_state_dict,
    )

    sd = _ae_state_dict(seg)
    variables = convert_torch_autoencoder_state_dict(
        {"model_state_dict": sd}
    )
    with torch.no_grad():
        x = torch.rand(2, 3, 32, 32, generator=torch.Generator().manual_seed(4))
        want = _ae_oracle_forward(sd, x, seg).numpy().transpose(0, 2, 3, 1)
    model = (SegmentationAutoencoder(num_classes=4, base=BASE) if seg
             else ReconstructionAutoencoder(base=BASE))
    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False,
    ))
    np.testing.assert_allclose(got, want, atol=5e-5)

    # loadability: names and shapes equal the model's own init
    import flax
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                      train=False)
    for col in ("params", "batch_stats"):
        got_s = {k: np.asarray(v).shape for k, v in
                 flax.traverse_util.flatten_dict(variables[col], sep="/").items()}
        want_s = {k: np.asarray(v).shape for k, v in
                  flax.traverse_util.flatten_dict(init[col], sep="/").items()}
        assert got_s == want_s, col


def _clipunet_state_dict(seed=0, num_layers=3,
                         blocks=((64, 32), (32, 16))):
    """Reference ClipUNet keys at smoke ViT size: HF vision tower under
    encoder.clip_vit.* (clip/clipunet.py:26) + decoder/output_layer."""
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(seed)
    cfg = transformers.CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=num_layers, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
    )
    hf = transformers.CLIPVisionModel(cfg)
    sd = {f"encoder.clip_vit.{k}": v for k, v in hf.state_dict().items()}
    g = torch.Generator().manual_seed(seed + 1)

    def conv(prefix, cout, cin, k, bias=True):
        s = (cin * k * k) ** -0.5
        sd[prefix + ".weight"] = torch.randn(cout, cin, k, k, generator=g) * s
        if bias:
            sd[prefix + ".bias"] = torch.randn(cout, generator=g) * 0.1

    def bn(prefix, c):
        sd[prefix + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[prefix + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[prefix + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[prefix + ".running_var"] = torch.rand(c, generator=g) + 0.5

    # default: decoder_channels (64, 32, 16), skip_indices (1, 2)
    conv("decoder.init_conv", blocks[0][0], 64, 1)
    for i, (cin, cout) in enumerate(blocks):
        p = f"decoder.decoder_blocks.{i}"
        half = cin // 2
        sd[f"{p}.upsample.weight"] = (
            torch.randn(cin, half, 2, 2, generator=g) * cin**-0.5
        )
        sd[f"{p}.upsample.bias"] = torch.randn(half, generator=g) * 0.1
        conv(f"{p}.skip_conv", half, 64, 1)
        conv(f"{p}.conv_block.0", cout, 2 * half, 3, bias=False)
        bn(f"{p}.conv_block.1", cout)
        conv(f"{p}.conv_block.3", cout, cout, 3, bias=False)
        bn(f"{p}.conv_block.4", cout)
    conv("output_layer", 4, blocks[-1][1], 1)
    return sd, hf


def _clipunet_oracle(sd, hf, x):
    """Functional decoder over the real HF vision tower (our ClipViT has
    separate bit-parity tests vs HF, so this pins the full wiring)."""
    with torch.no_grad():
        out = hf(pixel_values=x, output_hidden_states=True)

    def grid(tokens):
        n = tokens.shape[0]
        return tokens[:, 1:, :].reshape(n, 2, 2, 64).permute(0, 3, 1, 2)

    y = F.conv2d(grid(out.last_hidden_state), sd["decoder.init_conv.weight"],
                 sd["decoder.init_conv.bias"])
    skips = [grid(out.hidden_states[i]) for i in (1, 2)]
    for i, skip in zip(range(2), reversed(skips)):
        p = f"decoder.decoder_blocks.{i}"
        y = F.conv_transpose2d(y, sd[f"{p}.upsample.weight"],
                               sd[f"{p}.upsample.bias"], stride=2)
        s = F.conv2d(skip, sd[f"{p}.skip_conv.weight"],
                     sd[f"{p}.skip_conv.bias"])
        if s.shape[2:] != y.shape[2:]:
            s = F.interpolate(s, size=y.shape[2:], mode="bilinear",
                              align_corners=False)
        y = torch.cat([y, s], 1)
        for c, n in ((0, 1), (3, 4)):
            y = F.conv2d(y, sd[f"{p}.conv_block.{c}.weight"], None, padding=1)
            y = F.batch_norm(
                y, sd[f"{p}.conv_block.{n}.running_mean"],
                sd[f"{p}.conv_block.{n}.running_var"],
                sd[f"{p}.conv_block.{n}.weight"],
                sd[f"{p}.conv_block.{n}.bias"], training=False, eps=1e-5,
            )
            y = F.relu(y)
    return F.conv2d(y, sd["output_layer.weight"], sd["output_layer.bias"])


@pytest.mark.slow
def test_clipunet_conversion_matches_oracle():
    from image_segmentation_tpu.models.clip_unet import ClipUNet
    from image_segmentation_tpu.models.clip_vit import ClipViTConfig
    from image_segmentation_tpu.models.torch_import import (
        convert_torch_clipunet_state_dict,
    )

    sd, hf = _clipunet_state_dict()
    variables = convert_torch_clipunet_state_dict({"model_state_dict": sd})

    with torch.no_grad():
        x = torch.rand(2, 3, 32, 32, generator=torch.Generator().manual_seed(9))
        want = _clipunet_oracle(sd, hf, x).numpy().transpose(0, 2, 3, 1)

    model = ClipUNet(
        num_classes=4,
        vit=ClipViTConfig(image_size=32, patch_size=16, hidden_size=64,
                          num_layers=3, num_heads=4, mlp_dim=128),
        skip_indices=(1, 2), decoder_channels=(64, 32, 16),
    )
    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False,
    ))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_prompt_conversion_loads_into_prompt_model():
    """PromptModel = clip.(full ClipUNet) + mask.(4-in/1-out UNet)
    (reference prompt_based/prompt.py:15-16): converted tree must match
    PromptModel.init name-for-name and shape-for-shape (the two halves'
    numerics are pinned by their own oracle tests)."""
    import flax

    from image_segmentation_tpu.models.clip_vit import ClipViTConfig
    from image_segmentation_tpu.models.prompt import PromptModel
    from image_segmentation_tpu.models.torch_import import (
        convert_torch_prompt_state_dict,
    )

    # 4 decoder blocks climb the smoke grid (2px) back to the 32px input
    # so the clip and mask branches meet at the same resolution
    clip_sd, _ = _clipunet_state_dict(
        seed=3, num_layers=4,
        blocks=((64, 32), (32, 16), (16, 8), (8, 8)),
    )
    mask_sd = _reference_layout_state_dict(seed=4, din=4, dout=1)
    sd = {f"clip.{k}": v for k, v in clip_sd.items()}
    sd.update({f"mask.{k}": v for k, v in mask_sd.items()})
    variables = convert_torch_prompt_state_dict({"model_state_dict": sd})

    model = PromptModel(
        vit=ClipViTConfig(image_size=32, patch_size=16, hidden_size=64,
                          num_layers=4, num_heads=4, mlp_dim=128),
        skip_indices=(1, 2, 3, 4), decoder_channels=(64, 32, 16, 8, 8),
        unet_base=BASE,
    )
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 32, 32, 1)), train=False,
    )
    for col in ("params", "batch_stats"):
        got = {k: np.asarray(v).shape for k, v in
               flax.traverse_util.flatten_dict(variables[col], sep="/").items()}
        want = {k: np.asarray(v).shape for k, v in
                flax.traverse_util.flatten_dict(init[col], sep="/").items()}
        assert got == want, col


@pytest.mark.slow
def test_migrated_checkpoint_fine_tunes_through_runner(tmp_path):
    """Full migration-then-fine-tune flow: reference torch UNet .pth ->
    conversion script -> run.py --init-weights trains from the migrated
    weights (full-size base=64 tree, matching the unet config)."""
    import sys

    sys.path.insert(0, ".")
    from scripts.convert_unet_weights import main as convert_main

    from image_segmentation_tpu.run import main as run_main

    # base=64: the layout helper only fixes names; widths follow BASE, so
    # build a full-size dict by temporarily scaling
    global BASE
    old = BASE
    try:
        BASE = 64
        sd = _reference_layout_state_dict(seed=6)
    finally:
        BASE = old
    pth = str(tmp_path / "ref.pth")
    torch.save({"model_state_dict": sd}, pth)
    out = str(tmp_path / "MO_unet")
    convert_main(["--torch-checkpoint", pth, "--out", out])

    res = run_main([
        "--config", "unet_noaug", "--synthetic", "6", "--epochs", "1",
        "--batch-size", "2", "--target-size", "32",
        "--save-dir", str(tmp_path / "runs"), "--init-weights", out,
        "--max-devices", "1",
    ])
    assert len(res.history["train_loss"]) == 1
