"""Custom audio-stack parity vs independent torch translations of the
Swift reference (tests/torch_ref/*). Complements
test_torch_parity_models.py (which covers what HF transformers
implements): these components — S3Tokenizer FSQ, SNAC, CAMPPlus, SANM,
HiFT, Kokoro generator, S3Gen conformer/flow — have no external torch
implementation available offline, so the torch side is translated
directly from the Swift sources and identical weights are loaded into
both. VERDICT round-2 item #2.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

ATOL = 1e-4


def _t2np(sd):
    return {k: v.detach().float().numpy() for k, v in sd.items()}


def _conv_KIO(w):  # torch conv (O, I, K) -> framework (K, I, O)
    return np.transpose(w, (2, 1, 0))


# --------------------------------------------------------------- s3tokenizer

class TestS3TokenizerFSQ:
    def _models(self, n_layer=2, n_state=64, n_head=4, n_mels=16):
        from tests.torch_ref.s3tokenizer import S3TokenizerV2

        from tpu_audio.codecs.s3tokenizer import model as s3m

        torch.manual_seed(0)
        tm = S3TokenizerV2(n_mels=n_mels, n_state=n_state, n_head=n_head,
                           n_layer=n_layer).eval()
        sd = _t2np(tm.state_dict())

        cfg = s3m.S3TokenizerConfig(n_mels=n_mels, n_audio_state=n_state,
                                    n_audio_head=n_head, n_audio_layer=n_layer)
        params = s3m.init_params(jax.random.PRNGKey(0), cfg)
        enc = params["encoder"]
        for c in ("conv1", "conv2"):
            enc[c]["weight"] = jnp.asarray(_conv_KIO(sd[f"encoder.{c}.weight"]))
            enc[c]["bias"] = jnp.asarray(sd[f"encoder.{c}.bias"])
        for i in range(n_layer):
            bp = enc["blocks"][str(i)]
            pre = f"encoder.blocks.{i}."
            for name in ("query", "value", "out"):
                bp["attn"][name] = {
                    "weight": jnp.asarray(sd[pre + f"attn.{name}.weight"]),
                    "bias": jnp.asarray(sd[pre + f"attn.{name}.bias"])}
            bp["attn"]["key"] = {
                "weight": jnp.asarray(sd[pre + "attn.key.weight"])}
            bp["attn"]["fsmn_block"] = {
                "weight": jnp.asarray(
                    _conv_KIO(sd[pre + "attn.fsmn_block.weight"]))}
            bp["attn_ln"] = {"weight": jnp.asarray(sd[pre + "attn_ln.weight"]),
                             "bias": jnp.asarray(sd[pre + "attn_ln.bias"])}
            bp["mlp"]["fc1"] = {"weight": jnp.asarray(sd[pre + "mlp.0.weight"]),
                                "bias": jnp.asarray(sd[pre + "mlp.0.bias"])}
            bp["mlp"]["fc2"] = {"weight": jnp.asarray(sd[pre + "mlp.2.weight"]),
                                "bias": jnp.asarray(sd[pre + "mlp.2.bias"])}
            bp["mlp_ln"] = {"weight": jnp.asarray(sd[pre + "mlp_ln.weight"]),
                            "bias": jnp.asarray(sd[pre + "mlp_ln.bias"])}
        params["quantizer"]["fsq_codebook"]["project_down"] = {
            "weight": jnp.asarray(sd["fsq.project_down.weight"]),
            "bias": jnp.asarray(sd["fsq.project_down.bias"])}
        return tm, params, cfg

    def test_hidden_and_codes_match(self, rng):
        from tpu_audio.codecs.s3tokenizer import model as s3m

        tm, params, cfg = self._models()
        b, t = 2, 96
        mel = rng.standard_normal((b, cfg.n_mels, t)).astype(np.float32)
        mel_len = np.asarray([t, t - 20], np.int32)

        with torch.no_grad():
            th, tl = tm.encoder(torch.from_numpy(mel),
                                torch.from_numpy(mel_len))
            tcodes, _ = tm.quantize(torch.from_numpy(mel),
                                    torch.from_numpy(mel_len))
        jh, jl = s3m.encode_hidden(params, cfg,
                                   jnp.asarray(mel.transpose(0, 2, 1)),
                                   jnp.asarray(mel_len))
        jcodes, _ = s3m.quantize(params, cfg,
                                 jnp.asarray(mel.transpose(0, 2, 1)),
                                 jnp.asarray(mel_len))
        assert np.asarray(jl).tolist() == tl.numpy().tolist()
        # compare only valid positions of each row
        for r, ln in enumerate(np.asarray(jl)):
            np.testing.assert_allclose(np.asarray(jh)[r, :ln],
                                       th.numpy()[r, :ln], atol=ATOL)
            # FSQ rounds to a 3-level lattice; exact integer agreement
            assert (np.asarray(jcodes)[r, :ln]
                    == tcodes.numpy()[r, :ln]).all()

    def test_rope_convention_is_half_split(self):
        """Regression lock for the round-3 fix: the reference rotates
        half-split (dims (i, i+D/2)) with freqs theta^(-i/dim), NOT
        interleaved pairs with theta^(-2i/dim)."""
        from tpu_audio.codecs.s3tokenizer.model import (_apply_rotary_half,
                                                        _freqs_cis)

        cos, sin = _freqs_cis(8, 4)
        # non-standard ladder: second frequency is theta^(-1/8)
        assert abs(cos[1, 1] - np.cos(10000.0 ** (-1 / 8))) < 1e-6
        x = np.zeros((1, 1, 1, 8), np.float32)
        x[0, 0, 0, 0] = 1.0
        out = np.asarray(_apply_rotary_half(jnp.asarray(x), cos[1:2],
                                            sin[1:2]))
        # dim 0 pairs with dim 4: rotation leaks into index 4, not 1
        assert abs(out[0, 0, 0, 4]) > 0.5
        assert out[0, 0, 0, 1] == 0.0


# --------------------------------------------------------------------- snac

class TestSNAC:
    CFG = dict(latent_dim=16, decoder_dim=32, decoder_rates=(4, 4, 2, 2),
               codebook_size=64, codebook_dim=4, vq_strides=(4, 2, 1),
               noise=True, depthwise=True)

    def _models(self):
        from tests.torch_ref.snac import SNACDecoder as TorchSNAC

        from tpu_audio.codecs import snac

        torch.manual_seed(1)
        tm = TorchSNAC(**self.CFG).eval()
        cfg = snac.SNACConfig(sampling_rate=24000, **self.CFG)
        params = snac.init_params(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def wn(prefix, transpose=False):
            if transpose:  # conv-transpose: torch (I, O, K) -> (K, I, O)
                v = np.transpose(sd[prefix + ".weight_v"], (2, 0, 1))
                g = sd[prefix + ".weight_g"].reshape(1, -1, 1)
            else:  # conv: torch (O, I/g, K) -> (K, I/g, O)
                v = _conv_KIO(sd[prefix + ".weight_v"])
                g = sd[prefix + ".weight_g"].reshape(1, 1, -1)
            p = {"weight_v": jnp.asarray(v), "weight_g": jnp.asarray(g)}
            if prefix + ".bias" in sd:
                p["bias"] = jnp.asarray(sd[prefix + ".bias"])
            return p

        def alpha(prefix):  # torch (1, C, 1) -> (1, 1, C)
            return {"alpha": jnp.asarray(
                np.transpose(sd[prefix + ".alpha"], (0, 2, 1)))}

        for i in range(len(self.CFG["vq_strides"])):
            params["quantizer"][str(i)] = {
                "codebook": {"weight": jnp.asarray(
                    sd[f"codebooks.{i}.weight"])},
                "out_proj": wn(f"out_projs.{i}")}
        dec = params["decoder"]
        dec["depthwise_conv"] = wn("depthwise_conv")
        dec["pointwise_conv"] = wn("pointwise_conv")
        dec["final_conv"] = wn("final_conv")
        dec["final_snake"] = alpha("final_snake")
        for i in range(4):
            blk = dec["blocks"][str(i)]
            pre = f"blocks.{i}"
            blk["snake"] = alpha(pre + ".snake")
            blk["convT"] = wn(pre + ".convT", transpose=True)
            blk["noise"] = {"linear": wn(pre + ".noise_block.linear")}
            for j in range(3):
                rp = f"{pre}.residuals.{j}"
                blk["residuals"][str(j)] = {
                    "snake1": alpha(rp + ".snake1"),
                    "conv1": wn(rp + ".conv1"),
                    "snake2": alpha(rp + ".snake2"),
                    "conv2": wn(rp + ".conv2")}
        return tm, params, cfg

    def test_decode_with_injected_noise(self, rng):
        from tpu_audio.codecs import snac

        tm, params, cfg = self._models()
        b, t = 2, 12  # stride-1 frames
        codes_np = [rng.integers(0, 64, (b, t // s)).astype(np.int64)
                    for s in (4, 2, 1)][::-1]  # strides (4,2,1) order
        codes_np = [rng.integers(0, 64, (b, t // s)).astype(np.int64)
                    for s in (4, 2, 1)]
        # per-block noises at each upsampled length
        lens, cur = [], t
        for s in self.CFG["decoder_rates"]:
            cur *= s
            lens.append(cur)
        noises = [rng.standard_normal((b, 1, n)).astype(np.float32)
                  for n in lens]
        with torch.no_grad():
            twav = tm.decode([torch.from_numpy(c) for c in codes_np],
                             noises=[torch.from_numpy(n) for n in noises])
        jwav = snac.decode_latent(
            params, cfg,
            snac.embed_codes(params, cfg,
                             [jnp.asarray(c.astype(np.int32))
                              for c in codes_np]),
            noises=[n.transpose(0, 2, 1) for n in noises])
        np.testing.assert_allclose(np.asarray(jwav), twav.numpy()[:, 0],
                                   atol=ATOL)

    def test_embed_codes_match(self, rng):
        from tpu_audio.codecs import snac

        tm, params, cfg = self._models()
        codes_np = [rng.integers(0, 64, (1, 8 // s)).astype(np.int64)
                    for s in (4, 2, 1)]
        with torch.no_grad():
            tz = tm.embed_codes([torch.from_numpy(c) for c in codes_np])
        jz = snac.embed_codes(params, cfg,
                              [jnp.asarray(c.astype(np.int32))
                               for c in codes_np])
        np.testing.assert_allclose(np.asarray(jz).transpose(0, 2, 1),
                                   tz.numpy(), atol=ATOL)


# --------------------------------------------------------------------- sanm

class TestSANMEncoder:
    def _models(self):
        from tests.torch_ref.sanm import SenseVoiceEncoder as TorchEnc

        from tpu_audio.models.funasr import model as fm

        torch.manual_seed(2)
        kw = dict(input_dim=24, encoder_dim=32, n_head=4, ffn=64,
                  n_enc0=1, n_enc=2, n_tp=1)
        tm = TorchEnc(**kw).eval()
        cfg = fm.SenseVoiceConfig(input_dim=24, encoder_dim=32, num_heads=4,
                                  ffn_dim=64, num_encoders0=1,
                                  num_encoders=2, num_tp_encoders=1)
        params = fm.init_encoder(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def lin(prefix):
            p = {"weight": jnp.asarray(sd[prefix + ".weight"])}
            if prefix + ".bias" in sd:
                p["bias"] = jnp.asarray(sd[prefix + ".bias"])
            return p

        def norm(prefix):
            return {"weight": jnp.asarray(sd[prefix + ".weight"]),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        for group, n in (("encoders0", 1), ("encoders", 2),
                         ("tp_encoders", 1)):
            for i in range(n):
                pre = f"{group}.{i}"
                params[group][str(i)] = {
                    "norm1": norm(pre + ".norm1"),
                    "self_attn": {
                        "linear_q_k_v": lin(pre + ".self_attn.linear_q_k_v"),
                        "linear_out": lin(pre + ".self_attn.linear_out"),
                        "fsmn_block": {"weight": jnp.asarray(_conv_KIO(
                            sd[pre + ".self_attn.fsmn_block.weight"]))},
                    },
                    "norm2": norm(pre + ".norm2"),
                    "feed_forward": {
                        "w_1": lin(pre + ".feed_forward.w_1"),
                        "w_2": lin(pre + ".feed_forward.w_2")},
                }
        params["after_norm"] = norm("after_norm")
        params["tp_norm"] = norm("tp_norm")
        return tm, params, cfg

    @pytest.mark.parametrize("lens", [(64, 64), (64, 40)])
    def test_encoder_matches(self, rng, lens):
        from tpu_audio.models.funasr import model as fm

        tm, params, cfg = self._models()
        b, t = len(lens), max(lens)
        x = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
        lengths = np.asarray(lens, np.int32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()
        jout = np.asarray(fm.encode(params, cfg, jnp.asarray(x),
                                    jnp.asarray(lengths)))
        for r, ln in enumerate(lens):
            np.testing.assert_allclose(jout[r, :ln], tout[r, :ln], atol=ATOL)


# ----------------------------------------------------------------- campplus

class TestCAMPPlus:
    def _models(self):
        from tests.torch_ref.campplus import CAMPPlus as TorchCAMPPlus

        from tpu_audio.codecs.s3gen import campplus as cp

        torch.manual_seed(3)
        kw = dict(feat_dim=16, embedding_size=24, growth_rate=8, bn_size=2,
                  init_channels=16, blocks=(2, 2, 2), kernels=(3, 3, 3),
                  dilations=(1, 2, 2))
        tm = TorchCAMPPlus(**kw).eval()
        # randomize BN running stats so eval-mode normalization is exercised
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.6, 1.5)
        cfg = cp.CAMPPlusConfig(**{k: v for k, v in kw.items()})
        params = cp.init_params(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def c2d(prefix):  # torch (O, I, kh, kw) -> HWIO
            return {"weight": jnp.asarray(
                np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)))}

        def c1d(prefix):
            p = {"weight": jnp.asarray(_conv_KIO(sd[prefix + ".weight"]))}
            if prefix + ".bias" in sd:
                p["bias"] = jnp.asarray(sd[prefix + ".bias"])
            return p

        def bn(prefix, affine=True):
            p = {"running_mean": jnp.asarray(sd[prefix + ".running_mean"]),
                 "running_var": jnp.asarray(sd[prefix + ".running_var"])}
            if affine:
                p["weight"] = jnp.asarray(sd[prefix + ".weight"])
                p["bias"] = jnp.asarray(sd[prefix + ".bias"])
            else:
                n = sd[prefix + ".running_mean"].shape[0]
                p["weight"] = jnp.ones((n,), jnp.float32)
                p["bias"] = jnp.zeros((n,), jnp.float32)
            return p

        def res(prefix):
            p = {"conv1": c2d(prefix + ".conv1"), "bn1": bn(prefix + ".bn1"),
                 "conv2": c2d(prefix + ".conv2"), "bn2": bn(prefix + ".bn2")}
            if prefix + ".shortcut.0.weight" in sd:
                p["shortcut"] = {"0": c2d(prefix + ".shortcut.0"),
                                 "1": bn(prefix + ".shortcut.1")}
            return p

        params["head"] = {
            "conv1": c2d("head.conv1"), "bn1": bn("head.bn1"),
            "layer1": {"0": res("head.layer1.0"), "1": res("head.layer1.1")},
            "layer2": {"0": res("head.layer2.0"), "1": res("head.layer2.1")},
            "conv2": c2d("head.conv2"), "bn2": bn("head.bn2")}
        params["tdnn"] = {"linear": c1d("tdnn.linear"), "bn": bn("tdnn.bn")}
        for bi, n in enumerate(kw["blocks"]):
            for li in range(n):
                pre = f"blocks.{bi}.{li}"
                params["blocks"][str(bi)][str(li)] = {
                    "nonlinear1_bn": bn(pre + ".bn1"),
                    "linear1": c1d(pre + ".linear1"),
                    "nonlinear2_bn": bn(pre + ".bn2"),
                    "cam_layer": {
                        "linear_local": c1d(pre + ".cam_layer.linear_local"),
                        "linear1": c1d(pre + ".cam_layer.linear1"),
                        "linear2": c1d(pre + ".cam_layer.linear2")}}
            params["transits"][str(bi)] = {
                "nonlinear_bn": bn(f"transits.{bi}.bn"),
                "linear": c1d(f"transits.{bi}.linear")}
        params["out_nonlinear_bn"] = bn("out_bn")
        params["dense"] = {"linear": c1d("dense_linear"),
                           "nonlinear_bn": bn("dense_bn", affine=False)}
        return tm, params, cfg

    def test_embedding_matches(self, rng):
        from tpu_audio.codecs.s3gen import campplus as cp

        tm, params, cfg = self._models()
        fb = rng.standard_normal((2, 230, cfg.feat_dim)).astype(np.float32)
        fb = fb - fb.mean(axis=1, keepdims=True)
        with torch.no_grad():
            tout = tm(torch.from_numpy(fb)).numpy()
        jout = np.asarray(cp.embed(params, cfg, jnp.asarray(fb)))
        np.testing.assert_allclose(jout, tout, atol=2e-4)


# --------------------------------------------------------------------- hift

class TestHiFT:
    def _models(self):
        from tests.torch_ref.hift import HiFTGenerator as TorchHiFT

        from tpu_audio.codecs.s3gen import hift

        torch.manual_seed(4)
        tkw = dict(in_channels=8, base_channels=32, nb_harmonics=2,
                   sampling_rate=24000, upsample_rates=(4, 3),
                   upsample_kernels=(8, 7), n_fft=16, hop=4,
                   resblock_kernels=(3, 7),
                   resblock_dilations=((1, 3), (1, 3)),
                   source_resblock_kernels=(7, 7),
                   source_resblock_dilations=((1, 3), (1, 3)))
        tm = TorchHiFT(**tkw).eval()
        cfg = hift.HiFTConfig(
            in_channels=8, base_channels=32, nb_harmonics=2,
            sampling_rate=24000, upsample_rates=(4, 3),
            upsample_kernels=(8, 7), istft_n_fft=16, istft_hop=4,
            resblock_kernels=(3, 7), resblock_dilations=((1, 3), (1, 3)),
            source_resblock_kernels=(7, 7),
            source_resblock_dilations=((1, 3), (1, 3)))
        params = hift.init_params(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def c1d(prefix):
            return {"weight": jnp.asarray(_conv_KIO(sd[prefix + ".weight"])),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        def convT(prefix):  # (I, O, K) -> (K, I, O)
            return {"weight": jnp.asarray(np.transpose(
                sd[prefix + ".weight"], (2, 0, 1))),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

        def res(prefix, n):
            return {
                "convs1": {str(i): c1d(f"{prefix}.convs1.{i}")
                           for i in range(n)},
                "convs2": {str(i): c1d(f"{prefix}.convs2.{i}")
                           for i in range(n)},
                "activations1": {str(i): {"alpha": jnp.asarray(
                    sd[f"{prefix}.alphas1.{i}"])} for i in range(n)},
                "activations2": {str(i): {"alpha": jnp.asarray(
                    sd[f"{prefix}.alphas2.{i}"])} for i in range(n)},
            }

        params["m_source"]["l_linear"] = {
            "weight": jnp.asarray(sd["l_linear.weight"]),
            "bias": jnp.asarray(sd["l_linear.bias"])}
        params["conv_pre"] = c1d("conv_pre")
        params["conv_post"] = c1d("conv_post")
        for i in range(2):
            params["ups"][str(i)] = convT(f"ups.{i}")
            params["source_downs"][str(i)] = c1d(f"source_downs.{i}")
            params["source_resblocks"][str(i)] = res(
                f"source_resblocks.{i}", 2)
        for i in range(4):  # 2 ups × 2 kernels
            params["resblocks"][str(i)] = res(f"resblocks.{i}", 2)
        params["f0_predictor"] = {
            "condnet": {str(i): c1d(f"f0_predictor.condnet.{i}")
                        for i in range(5)},
            "classifier": {
                "weight": jnp.asarray(sd["f0_predictor.classifier.weight"]),
                "bias": jnp.asarray(sd["f0_predictor.classifier.bias"])}}
        return tm, params, cfg

    def test_full_vocoder_matches(self, rng):
        from tpu_audio.codecs.s3gen import hift

        tm, params, cfg = self._models()
        b, t = 1, 12
        # mel scaled up so predicted |f0| spans voiced and unvoiced ranges
        mel = (rng.standard_normal((b, t, cfg.in_channels)) * 4.0
               ).astype(np.float32)
        per = cfg.upsample_scale
        r = rng.uniform(0, 1, (b, cfg.nb_harmonics + 1)).astype(np.float32)
        r[:, 0] = 0.0
        noise = rng.standard_normal((b, t * per, cfg.nb_harmonics + 1)
                                    ).astype(np.float32)

        with torch.no_grad():
            taudio, tsource = tm(
                torch.from_numpy(mel.transpose(0, 2, 1)),
                torch.from_numpy((2 * np.pi * r)[:, :, None]),
                torch.from_numpy(noise.transpose(0, 2, 1)))

        f0 = hift.f0_predict(params["f0_predictor"], jnp.asarray(mel))
        f0_up = jnp.repeat(f0[..., None], per, axis=1)
        src, _ = hift.sine_source(params["m_source"], cfg, f0_up,
                                  jax.random.PRNGKey(0),
                                  rand_ini=jnp.asarray(r),
                                  noise=jnp.asarray(noise))
        jsource = src[..., 0]
        np.testing.assert_allclose(np.asarray(jsource),
                                   tsource.numpy()[:, 0], atol=ATOL)
        jaudio = hift.decode(params, cfg, jnp.asarray(mel), jsource)
        np.testing.assert_allclose(np.asarray(jaudio), taudio.numpy(),
                                   atol=5e-4)


# --------------------------------------------------------------- kokoro gen

class TestKokoroGenerator:
    def _models(self):
        from tests.torch_ref.kokoro_gen import KokoroGenerator as TorchGen

        from tpu_audio.models.kokoro import model as km
        from tpu_audio.models.kokoro.config import KokoroConfig

        torch.manual_seed(5)
        tm = TorchGen(style_dim=8, resblock_kernels=(3, 7),
                      upsample_rates=(5, 4), upsample_initial_channel=32,
                      resblock_dilations=((1, 3, 5), (1, 3, 5)),
                      upsample_kernels=(10, 8), n_fft=16, hop=4,
                      harmonics=4).eval()
        cfg = KokoroConfig(style_dim=8, resblock_kernels=(3, 7),
                           resblock_dilations=((1, 3, 5), (1, 3, 5)),
                           upsample_rates=(5, 4), upsample_kernels=(10, 8),
                           upsample_initial_channel=32, istft_n_fft=16,
                           istft_hop=4, harmonic_num=4)
        gen = km._init_generator(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def wn(prefix):
            return {"weight_v": jnp.asarray(_conv_KIO(
                        sd[prefix + ".weight_v"])),
                    "weight_g": jnp.asarray(
                        sd[prefix + ".weight_g"].reshape(1, 1, -1)),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        def wnT(prefix):
            return {"weight_v": jnp.asarray(np.transpose(
                        sd[prefix + ".weight_v"], (2, 0, 1))),
                    "weight_g": jnp.asarray(
                        sd[prefix + ".weight_g"].reshape(1, -1, 1)),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        def c1d(prefix):
            return {"weight": jnp.asarray(_conv_KIO(sd[prefix + ".weight"])),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        def adares(prefix):
            out = {"convs1": {}, "convs2": {}, "adain1": {}, "adain2": {},
                   "alpha1": {}, "alpha2": {}}
            for i in range(3):
                out["convs1"][str(i)] = wn(f"{prefix}.convs1.{i}")
                out["convs2"][str(i)] = wn(f"{prefix}.convs2.{i}")
                for nm in ("adain1", "adain2"):
                    out[nm][str(i)] = {"fc": {
                        "weight": jnp.asarray(sd[f"{prefix}.{nm}.{i}.fc.weight"]),
                        "bias": jnp.asarray(sd[f"{prefix}.{nm}.{i}.fc.bias"])}}
                out["alpha1"][str(i)] = jnp.asarray(
                    sd[f"{prefix}.alpha1.{i}"].reshape(1, 1, 1))
                out["alpha2"][str(i)] = jnp.asarray(
                    sd[f"{prefix}.alpha2.{i}"].reshape(1, 1, 1))
            return out

        gen["m_source"]["l_linear"] = {
            "weight": jnp.asarray(sd["l_linear.weight"]),
            "bias": jnp.asarray(sd["l_linear.bias"])}
        gen["conv_post"] = wn("conv_post")
        for i in range(2):
            gen["ups"][str(i)] = wnT(f"ups.{i}")
            gen["noise_convs"][str(i)] = c1d(f"noise_convs.{i}")
            gen["noise_res"][str(i)] = adares(f"noise_res.{i}")
        for i in range(4):
            gen["resblocks"][str(i)] = adares(f"resblocks.{i}")
        return tm, {"decoder": {"generator": gen}}, cfg

    def test_sine_source_and_stft_match(self, rng):
        """Harmonic source exactly; STFT compared as (mag, cos φ, sin φ) —
        the raw phase of near-silent bins sits on the ±π branch cut where
        any two float implementations chaotically differ by 2π."""
        from tpu_audio.models.kokoro import model as km

        tm, params, cfg = self._models()
        b, t2 = 1, 10
        f0 = (rng.uniform(0, 200, (b, t2))).astype(np.float32)
        up = 5 * 4 * 4
        r = rng.standard_normal((b, 5)).astype(np.float32)
        r[:, 0] = 0.0
        noise = rng.standard_normal((b, t2 * up, 5)).astype(np.float32)

        gp = params["decoder"]["generator"]
        f0_up_j = jnp.repeat(jnp.asarray(f0)[..., None], up, axis=1)
        har_j = km.sine_source(gp, cfg, f0_up_j, jax.random.PRNGKey(0),
                               rand_ini=jnp.asarray(r),
                               noise=jnp.asarray(noise))[..., 0]
        with torch.no_grad():
            from tests.torch_ref.kokoro_gen import sine_gen

            f0_up_t = torch.from_numpy(f0)[:, :, None].repeat_interleave(
                up, dim=1)
            sines = sine_gen(f0_up_t, 4, 24000, float(up), 0.1, 0.003, 10.0,
                             torch.from_numpy(r), torch.from_numpy(noise))
            har_t = torch.tanh(tm.l_linear(sines))[:, :, 0]
        np.testing.assert_allclose(np.asarray(har_j), har_t.numpy(),
                                   atol=ATOL)

        mag_j, ph_j = km._kokoro_stft(har_j, 16, 4)
        with torch.no_grad():
            mag_t, ph_t = tm._stft(har_t)
        np.testing.assert_allclose(np.asarray(mag_j).transpose(0, 2, 1),
                                   mag_t.numpy(), atol=ATOL)
        # phase error scales with 1/|bin|: near-silent bins are
        # ill-conditioned, so compare the unit-circle embedding loosely
        np.testing.assert_allclose(np.cos(np.asarray(ph_j)).transpose(0, 2, 1),
                                   np.cos(ph_t.numpy()), atol=5e-3)
        np.testing.assert_allclose(np.sin(np.asarray(ph_j)).transpose(0, 2, 1),
                                   np.sin(ph_t.numpy()), atol=5e-3)

    def test_decoder_stack_matches(self, rng):
        """noise convs, AdaIN resblocks, weight-norm ups, conv_post and
        iSTFT with a shared source spectrum injected into both."""
        from tpu_audio.models.kokoro import model as km

        tm, params, cfg = self._models()
        b, t2, ch = 1, 10, 32
        x = rng.standard_normal((b, t2, ch)).astype(np.float32)
        s = rng.standard_normal((b, 8)).astype(np.float32)
        f0 = (rng.uniform(0, 200, (b, t2))).astype(np.float32)
        n_frames = t2 * 5 * 4 * 4 // 4 + 1
        har = np.concatenate([
            np.abs(rng.standard_normal((b, n_frames, 9))),
            rng.uniform(-3, 3, (b, n_frames, 9))], -1).astype(np.float32)

        with torch.no_grad():
            taudio = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                        torch.from_numpy(s), torch.from_numpy(f0),
                        None, None,
                        har_spec=torch.from_numpy(
                            har.transpose(0, 2, 1))).numpy()
        jaudio = np.asarray(km.generator(
            params, cfg, jnp.asarray(x), jnp.asarray(s), jnp.asarray(f0),
            t2, jax.random.PRNGKey(0), har_override=jnp.asarray(har)))
        assert jaudio.shape == taudio.shape
        np.testing.assert_allclose(jaudio, taudio, atol=5e-4)


# ---------------------------------------------------------------- conformer

class TestUpsampleConformer:
    def _models(self):
        from tests.torch_ref.conformer import (
            UpsampleConformerEncoder as TorchConf)

        from tpu_audio.codecs.s3gen import conformer as cf

        torch.manual_seed(6)
        tm = TorchConf(input_size=24, output_size=32, heads=4, ff=64,
                       num_blocks=2, num_up_blocks=1,
                       static_chunk_size=8).eval()
        # give the zero-init pos biases real values
        with torch.no_grad():
            for layer in list(tm.encoders) + list(tm.up_encoders):
                layer.self_attn.pos_bias_u.uniform_(-0.5, 0.5)
                layer.self_attn.pos_bias_v.uniform_(-0.5, 0.5)
        cfg = cf.ConformerConfig(input_size=24, output_size=32, heads=4,
                                 linear_units=64, num_blocks=2,
                                 num_up_blocks=1, static_chunk_size=8)
        params = cf.init_params(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def lin(prefix, bias=True):
            p = {"weight": jnp.asarray(sd[prefix + ".weight"])}
            if bias:
                p["bias"] = jnp.asarray(sd[prefix + ".bias"])
            return p

        def layer_map(prefix):
            return {
                "self_attn": {
                    "linear_q": lin(prefix + ".self_attn.linear_q"),
                    "linear_k": lin(prefix + ".self_attn.linear_k"),
                    "linear_v": lin(prefix + ".self_attn.linear_v"),
                    "linear_out": lin(prefix + ".self_attn.linear_out"),
                    "linear_pos": lin(prefix + ".self_attn.linear_pos",
                                      bias=False),
                    "pos_bias_u": jnp.asarray(
                        sd[prefix + ".self_attn.pos_bias_u"]),
                    "pos_bias_v": jnp.asarray(
                        sd[prefix + ".self_attn.pos_bias_v"]),
                },
                "feed_forward": {"w_1": lin(prefix + ".w_1"),
                                 "w_2": lin(prefix + ".w_2")},
                "norm_ff": lin(prefix + ".norm_ff"),
                "norm_mha": lin(prefix + ".norm_mha"),
            }

        params["embed"] = {"out": lin("embed_out"),
                           "norm": lin("embed_norm")}
        params["pre_lookahead_layer"] = {
            "conv1": {"weight": jnp.asarray(_conv_KIO(sd["pl_conv1.weight"])),
                      "bias": jnp.asarray(sd["pl_conv1.bias"])},
            "conv2": {"weight": jnp.asarray(_conv_KIO(sd["pl_conv2.weight"])),
                      "bias": jnp.asarray(sd["pl_conv2.bias"])}}
        params["encoders"] = {str(i): layer_map(f"encoders.{i}")
                              for i in range(2)}
        params["up_layer"] = {"conv": {
            "weight": jnp.asarray(_conv_KIO(sd["up_conv.weight"])),
            "bias": jnp.asarray(sd["up_conv.bias"])}}
        params["up_embed"] = {"out": lin("up_embed_out"),
                              "norm": lin("up_embed_norm")}
        params["up_encoders"] = {"0": layer_map("up_encoders.0")}
        params["after_norm"] = lin("after_norm")
        return tm, params, cfg

    @pytest.mark.parametrize("streaming", [False, True])
    def test_forward_matches(self, rng, streaming):
        from tpu_audio.codecs.s3gen import conformer as cf

        tm, params, cfg = self._models()
        b, t = 2, 24
        x = rng.standard_normal((b, t, 24)).astype(np.float32)
        lens = np.asarray([24, 17], np.int32)
        with torch.no_grad():
            tout, tlens = tm(torch.from_numpy(x), torch.from_numpy(lens),
                             streaming=streaming)
        jout, jlens = cf.forward(params, cfg, jnp.asarray(x),
                                 jnp.asarray(lens), streaming=streaming)
        assert np.asarray(jlens).tolist() == tlens.numpy().tolist()
        for r, ln in enumerate(np.asarray(jlens)):
            np.testing.assert_allclose(np.asarray(jout)[r, :ln],
                                       tout.numpy()[r, :ln], atol=2e-4)


# ----------------------------------------------------------- matcha / flow

class TestMatchaFlow:
    def _models(self, meanflow=False):
        from tests.torch_ref.matcha import ConditionalDecoder as TorchDec

        from tpu_audio.codecs.s3gen import flow

        torch.manual_seed(7)
        tm = TorchDec(in_channels=32, out_channels=8, channels=16,
                      n_blocks=1, num_mid_blocks=2, heads=2, head_dim=8,
                      static_chunk_size=6, meanflow=meanflow).eval()
        cfg = flow.EstimatorConfig(in_channels=32, out_channels=8,
                                   channels=16, n_blocks=1, num_mid_blocks=2,
                                   num_heads=2, static_chunk_size=6,
                                   meanflow=meanflow)
        params = flow.init_estimator(jax.random.PRNGKey(0), cfg)
        sd = _t2np(tm.state_dict())

        def lin(prefix, bias=True):
            p = {"weight": jnp.asarray(sd[prefix + ".weight"])}
            if bias:
                p["bias"] = jnp.asarray(sd[prefix + ".bias"])
            return p

        def conv(prefix):
            return {"weight": jnp.asarray(_conv_KIO(sd[prefix + ".weight"])),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        def cblock(prefix):
            return {"conv": conv(prefix + ".conv.conv"),
                    "norm": lin(prefix + ".norm")}

        def resnet(prefix):
            return {"mlp_linear": lin(prefix + ".mlp_linear"),
                    "block1": cblock(prefix + ".block1"),
                    "block2": cblock(prefix + ".block2"),
                    "res_conv": conv(prefix + ".res_conv")}

        def tblock(prefix):
            return {"norm1": lin(prefix + ".norm1"),
                    "norm3": lin(prefix + ".norm3"),
                    "attn": {"q": lin(prefix + ".q", bias=False),
                             "k": lin(prefix + ".k", bias=False),
                             "v": lin(prefix + ".v", bias=False),
                             "o": lin(prefix + ".o")},
                    "ff": {"fc1": lin(prefix + ".ff1"),
                           "fc2": lin(prefix + ".ff2")}}

        params["time_mlp"] = {"linear_1": lin("time_l1"),
                              "linear_2": lin("time_l2")}
        params["down"] = {"resnet": resnet("down_resnet"),
                          "transformers": {"0": tblock("down_tf.0")},
                          "downsample": conv("down_conv.conv")}
        params["mid"] = {str(m): {"resnet": resnet(f"mid.{m}.0"),
                                  "transformers": {"0": tblock(f"mid.{m}.1.0")}}
                         for m in range(2)}
        params["up"] = {"resnet": resnet("up_resnet"),
                        "transformers": {"0": tblock("up_tf.0")},
                        "upsample": conv("up_conv.conv")}
        params["final_block"] = cblock("final_block")
        params["final_proj"] = conv("final_proj")
        if meanflow:
            params["time_embed_mixer"] = lin("time_embed_mixer", bias=False)
        return tm, params, cfg

    @pytest.mark.parametrize("streaming", [False, True])
    def test_estimator_matches(self, rng, streaming):
        from tpu_audio.codecs.s3gen import flow

        tm, params, cfg = self._models()
        b, t = 2, 18
        x = rng.standard_normal((b, t, 8)).astype(np.float32)
        mu = rng.standard_normal((b, t, 8)).astype(np.float32)
        spk = rng.standard_normal((b, 8)).astype(np.float32)
        cond = rng.standard_normal((b, t, 8)).astype(np.float32)
        lens = np.asarray([18, 13], np.int32)
        tv = np.asarray([0.3, 0.7], np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                      torch.from_numpy(lens),
                      torch.from_numpy(mu.transpose(0, 2, 1)),
                      torch.from_numpy(tv), torch.from_numpy(spk),
                      torch.from_numpy(cond.transpose(0, 2, 1)),
                      streaming=streaming).numpy()
        jout = np.asarray(flow.estimator_forward(
            params, cfg, jnp.asarray(x), jnp.asarray(lens), jnp.asarray(mu),
            jnp.asarray(tv), jnp.asarray(spk), jnp.asarray(cond),
            streaming=streaming))
        for r, ln in enumerate(lens):
            np.testing.assert_allclose(jout[r, :ln],
                                       tout.transpose(0, 2, 1)[r, :ln],
                                       atol=2e-4)

    def test_cfg_euler_matches(self, rng):
        """Full CFM solve: same z noise into both CFG Euler loops."""
        from tests.torch_ref.matcha import cfg_euler

        from tpu_audio.codecs.s3gen import flow

        tm, params, cfg = self._models()
        cfm = flow.CFMConfig(n_timesteps=4)
        b, t = 1, 12
        mu = rng.standard_normal((b, t, 8)).astype(np.float32)
        spk = rng.standard_normal((b, 8)).astype(np.float32)
        cond = rng.standard_normal((b, t, 8)).astype(np.float32)
        z = rng.standard_normal((b, t, 8)).astype(np.float32)
        lens = np.asarray([12], np.int32)

        def est_t(x, l, m, tv, s, c, stream):
            with torch.no_grad():
                return tm(x, l, m, tv, s, c, streaming=stream)

        tout = cfg_euler(est_t, torch.from_numpy(z.transpose(0, 2, 1)),
                         torch.from_numpy(mu.transpose(0, 2, 1)),
                         torch.from_numpy(lens), torch.from_numpy(spk),
                         torch.from_numpy(cond.transpose(0, 2, 1)),
                         4, cfm.inference_cfg_rate).numpy()

        def est_j(x, ml, mu_, tv, s, c, stream):
            return flow.estimator_forward(params, cfg, x, ml, mu_, tv, s, c,
                                          stream)

        # inject the SAME z by monkeypatched normal draw
        import unittest.mock as mock

        with mock.patch("jax.random.normal",
                        lambda k, shape, dtype=None: jnp.asarray(z)):
            jout = np.asarray(flow.cfm_solve(
                est_j, cfm, jnp.asarray(mu), jnp.asarray(lens),
                jnp.asarray(spk), jnp.asarray(cond), jax.random.PRNGKey(0)))
        np.testing.assert_allclose(jout, tout.transpose(0, 2, 1), atol=5e-4)


# ------------------------------------------------------------ cosyvoice3 DiT

class TestCV3DiT:
    """DiT estimator parity vs the independent torch translation of
    Flow/DiT.swift (tests/torch_ref/dit_cv3.py) with identical weights —
    VERDICT r4 #4. Locks the x_transformers flat-RoPE convention (only the
    first head_dim channels rotate), the mish conv position embedding, the
    half_dim-1 sinusoid, and the [x, cond, mu, spk] concat order."""

    def _models(self, num_left_chunks=-1, static=4):
        from tests.torch_ref.dit_cv3 import DiT as TorchDiT

        from tpu_audio.models.cosyvoice3 import dit

        torch.manual_seed(11)
        kw = dict(dim=32, depth=2, heads=4, head_dim=8, ff_mult=2,
                  mel_dim=16, mu_dim=24, spk_dim=12)
        tm = TorchDiT(static_chunk_size=static,
                      num_left_chunks=num_left_chunks, conv_groups=4,
                      **kw).eval()
        cfg = dit.DiTConfig(mel_dim=16, dim=32, depth=2, heads=4, head_dim=8,
                            ff_mult=2, mu_dim=24, spk_dim=12,
                            conv_pos_groups=4, static_chunk_size=static,
                            num_left_chunks=num_left_chunks)
        sd = _t2np(tm.state_dict())

        def lin(prefix):
            return {"weight": jnp.asarray(sd[prefix + ".weight"]),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        def conv(prefix):
            return {"weight": jnp.asarray(_conv_KIO(sd[prefix + ".weight"])),
                    "bias": jnp.asarray(sd[prefix + ".bias"])}

        params = {
            "time_embed": {"time_mlp_0": lin("time_embed.time_mlp_0"),
                           "time_mlp_2": lin("time_embed.time_mlp_2")},
            "input_embed": {"proj": lin("proj"),
                            "conv1": conv("conv_pos_embed.conv1"),
                            "conv2": conv("conv_pos_embed.conv2")},
            "blocks": {},
            "final_norm": {"linear": lin("norm_out_linear")},
            "proj_out": lin("proj_out"),
        }
        for i in range(2):
            params["blocks"][str(i)] = {
                "attn_norm": {"linear": lin(f"blocks.{i}.attn_norm_linear")},
                "attn": {"to_q": lin(f"blocks.{i}.attn.to_q"),
                         "to_k": lin(f"blocks.{i}.attn.to_k"),
                         "to_v": lin(f"blocks.{i}.attn.to_v"),
                         "to_out": lin(f"blocks.{i}.attn.to_out_0")},
                "ff": {"fc1": lin(f"blocks.{i}.ff_0_0"),
                       "fc2": lin(f"blocks.{i}.ff_2")},
            }
        return tm, params, cfg

    def _inputs(self, rng, b, n):
        x = rng.standard_normal((b, n, 16)).astype(np.float32)
        mu = rng.standard_normal((b, n, 24)).astype(np.float32)
        cond = rng.standard_normal((b, n, 16)).astype(np.float32)
        spk = rng.standard_normal((b, 12)).astype(np.float32)
        t = np.asarray([0.3] * b, np.float32)
        return x, mu, cond, spk, t

    def test_forward_parity(self, rng):
        from tpu_audio.models.cosyvoice3 import dit

        tm, params, cfg = self._models()
        x, mu, cond, spk, t = self._inputs(rng, 2, 10)
        lens = np.asarray([10, 7], np.int32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(x), torch.from_numpy(lens),
                      torch.from_numpy(mu), torch.from_numpy(t),
                      torch.from_numpy(spk), torch.from_numpy(cond)).numpy()
        jout = np.asarray(dit.forward(params, cfg, jnp.asarray(x),
                                      jnp.asarray(lens), jnp.asarray(mu),
                                      jnp.asarray(t), jnp.asarray(spk),
                                      jnp.asarray(cond)))
        for r, ln in enumerate(lens):
            np.testing.assert_allclose(jout[r, :ln], tout[r, :ln], atol=ATOL)

    def test_streaming_mask_parity(self, rng):
        """Chunked-causal streaming mask with UNBOUNDED left context
        (numDecodingLeftChunks = -1, the reference serving config)."""
        from tpu_audio.models.cosyvoice3 import dit

        tm, params, cfg = self._models()
        x, mu, cond, spk, t = self._inputs(rng, 1, 12)
        lens = np.asarray([12], np.int32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(x), torch.from_numpy(lens),
                      torch.from_numpy(mu), torch.from_numpy(t),
                      torch.from_numpy(spk), torch.from_numpy(cond),
                      streaming=True).numpy()
        jout = np.asarray(dit.forward(params, cfg, jnp.asarray(x),
                                      jnp.asarray(lens), jnp.asarray(mu),
                                      jnp.asarray(t), jnp.asarray(spk),
                                      jnp.asarray(cond), streaming=True))
        np.testing.assert_allclose(jout[0], tout[0], atol=ATOL)

    def test_padded_equals_exact(self, rng):
        """Right padding must not leak into valid frames (the JAX side runs
        padded buckets; the reference runs exact shapes)."""
        from tpu_audio.models.cosyvoice3 import dit

        tm, params, cfg = self._models()
        x, mu, cond, spk, t = self._inputs(rng, 1, 9)
        lens = np.asarray([9], np.int32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(x), torch.from_numpy(lens),
                      torch.from_numpy(mu), torch.from_numpy(t),
                      torch.from_numpy(spk), torch.from_numpy(cond)).numpy()
        pad = 7
        xp = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        jout = np.asarray(dit.forward(
            params, cfg, jnp.asarray(xp), jnp.asarray(lens),
            jnp.asarray(np.pad(mu, ((0, 0), (0, pad), (0, 0)))),
            jnp.asarray(t), jnp.asarray(spk),
            jnp.asarray(np.pad(cond, ((0, 0), (0, pad), (0, 0))))))
        np.testing.assert_allclose(jout[0, :9], tout[0], atol=ATOL)


class TestCV3MuPipeline:
    """Token-embedding → PreLookaheadLayer → ×2 repeat mu pipeline parity
    (CausalMaskedDiffWithDiT front half, Flow/CosyVoice3CFM.swift:317-368)
    in both finalize and streaming (context-split) modes."""

    def _models(self):
        from tests.torch_ref.dit_cv3 import MuPipeline

        from tpu_audio.models.cosyvoice3 import dit as ditmod
        from tpu_audio.models.cosyvoice3 import model as cv3

        torch.manual_seed(5)
        tm = MuPipeline(vocab=64, input_dim=24, dit_dim=40, spk_in=20,
                        spk_out=12, ratio=2, pre=3).eval()
        cfg = cv3.CV3FlowConfig(
            vocab_size=64, input_dim=24, spk_dim=20, mel_dim=16,
            dit=ditmod.DiTConfig(mel_dim=16, dim=40, depth=1, heads=2,
                                 head_dim=8, mu_dim=24, spk_dim=12,
                                 conv_pos_groups=4))
        sd = _t2np(tm.state_dict())
        params = {
            "input_embedding": {
                "weight": jnp.asarray(sd["input_embedding.weight"])},
            "spk_embed_affine_layer": {
                "weight": jnp.asarray(sd["spk_embed_affine_layer.weight"]),
                "bias": jnp.asarray(sd["spk_embed_affine_layer.bias"])},
            "pre_lookahead_layer": {
                "conv1": {"weight": jnp.asarray(_conv_KIO(
                    sd["pre_lookahead_layer.conv1.weight"])),
                    "bias": jnp.asarray(
                        sd["pre_lookahead_layer.conv1.bias"])},
                "conv2": {"weight": jnp.asarray(_conv_KIO(
                    sd["pre_lookahead_layer.conv2.weight"])),
                    "bias": jnp.asarray(
                        sd["pre_lookahead_layer.conv2.bias"])},
            },
        }
        return tm, params, cfg

    def _mu_jax(self, params, cfg, toks_padded, n, streaming):
        from tpu_audio.models.cosyvoice3 import model as cv3

        x = jnp.asarray(params["input_embedding"]["weight"])[
            jnp.clip(jnp.asarray(toks_padded), 0, cfg.vocab_size - 1)]
        x = jnp.where((jnp.arange(toks_padded.shape[1]) < n)[None, :, None],
                      x, 0)
        h = cv3.pre_lookahead(params["pre_lookahead_layer"], x,
                              cfg.pre_lookahead_len)
        return np.asarray(jnp.repeat(h, cfg.token_mel_ratio, axis=1))

    def test_finalize_mode(self):
        tm, params, cfg = self._models()
        rng = np.random.default_rng(3)
        toks = rng.integers(0, 64, (1, 11)).astype(np.int64)
        emb = rng.standard_normal((1, 20)).astype(np.float32)
        with torch.no_grad():
            tmu, tspk = tm(torch.from_numpy(toks),
                           torch.tensor([11]), torch.from_numpy(emb),
                           finalize=True)
        toks_p = np.pad(toks, ((0, 0), (0, 5)))
        jmu = self._mu_jax(params, cfg, toks_p, 11, False)
        np.testing.assert_allclose(jmu[0, :22], tmu.numpy()[0], atol=ATOL)
        # spk affine
        e = emb / np.sqrt((emb * emb).sum(-1, keepdims=True) + 1e-8)
        jspk = e @ np.asarray(
            params["spk_embed_affine_layer"]["weight"]).T + np.asarray(
            params["spk_embed_affine_layer"]["bias"])
        np.testing.assert_allclose(jspk, tspk.numpy(), atol=ATOL)

    def test_streaming_mode(self):
        """Streaming: the reference splits the last pre_lookahead_len real
        tokens off as conv context; the unified padded conv pass must agree
        on the (n - pre) valid positions."""
        tm, params, cfg = self._models()
        rng = np.random.default_rng(4)
        toks = rng.integers(0, 64, (1, 14)).astype(np.int64)
        emb = rng.standard_normal((1, 20)).astype(np.float32)
        with torch.no_grad():
            tmu, _ = tm(torch.from_numpy(toks), torch.tensor([14]),
                        torch.from_numpy(emb), finalize=False)
        toks_p = np.pad(toks, ((0, 0), (0, 2)))
        jmu = self._mu_jax(params, cfg, toks_p, 14, True)
        np.testing.assert_allclose(jmu[0, : (14 - 3) * 2], tmu.numpy()[0],
                                   atol=ATOL)


# --------------------------------------------------- chatterbox turbo CBT

class TestCBTMeanflow(TestMatchaFlow):
    """Chatterbox Turbo CBTDecoder parity (VERDICT r4 #4): the CBT U-Net is
    the same causal ConditionalDecoder graph as Matcha (locked above with
    identical weights), PLUS the meanflow (t, r) conditioning — the
    time_embed_mixer fusing both step-endpoint embeddings
    (CBTDecoder.swift:602-625) — and the no-CFG linear-grid basicEuler
    solve (CBTFlowMatching.swift:77-117)."""

    def test_estimator_with_r_matches(self, rng):
        from tpu_audio.codecs.s3gen import flow

        tm, params, cfg = self._models(meanflow=True)
        b, t = 2, 14
        x = rng.standard_normal((b, t, 8)).astype(np.float32)
        mu = rng.standard_normal((b, t, 8)).astype(np.float32)
        spk = rng.standard_normal((b, 8)).astype(np.float32)
        cond = rng.standard_normal((b, t, 8)).astype(np.float32)
        lens = np.asarray([14, 9], np.int32)
        tv = np.asarray([0.0, 0.5], np.float32)
        rv = np.asarray([0.5, 1.0], np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                      torch.from_numpy(lens),
                      torch.from_numpy(mu.transpose(0, 2, 1)),
                      torch.from_numpy(tv), torch.from_numpy(spk),
                      torch.from_numpy(cond.transpose(0, 2, 1)),
                      r=torch.from_numpy(rv)).numpy()
        jout = np.asarray(flow.estimator_forward(
            params, cfg, jnp.asarray(x), jnp.asarray(lens), jnp.asarray(mu),
            jnp.asarray(tv), jnp.asarray(spk), jnp.asarray(cond),
            r=jnp.asarray(rv)))
        for row, ln in enumerate(lens):
            np.testing.assert_allclose(jout[row, :ln],
                                       tout.transpose(0, 2, 1)[row, :ln],
                                       atol=2e-4)

    def test_meanflow_solve_matches(self, rng):
        """Full 2-step meanflow Euler: same z into both solvers."""
        import unittest.mock as mock

        from tests.torch_ref.matcha import basic_euler_meanflow

        from tpu_audio.codecs.s3gen import flow
        from tpu_audio.models.chatterbox_turbo.model import meanflow_inference

        tm, params, cfg = self._models(meanflow=True)
        b, t = 1, 12
        mu = rng.standard_normal((b, t, 8)).astype(np.float32)
        spk = rng.standard_normal((b, 8)).astype(np.float32)
        cond = rng.standard_normal((b, t, 8)).astype(np.float32)
        lens = np.asarray([12], np.int32)
        z = rng.standard_normal((b, t, 8)).astype(np.float32)

        def est_t(x, ln, mu_, tt, s, c, stream, r):
            return tm(x.transpose(1, 2), ln, mu_.transpose(1, 2), tt, s,
                      c.transpose(1, 2), streaming=stream,
                      r=r).transpose(1, 2)

        with torch.no_grad():
            tout = basic_euler_meanflow(
                est_t, torch.from_numpy(z), torch.from_numpy(mu),
                torch.from_numpy(lens), torch.from_numpy(spk),
                torch.from_numpy(cond), 2).numpy()

        def est_j(x, ml, mu_, tt, s, c, stream, r=None):
            return flow.estimator_forward(params, cfg, x, ml, mu_, tt, s, c,
                                          stream, r=r)

        with mock.patch("jax.random.normal",
                        lambda k, shape, dtype=None: jnp.asarray(z)):
            jout = np.asarray(meanflow_inference(
                est_j, jnp.asarray(mu), jnp.asarray(lens), jnp.asarray(spk),
                jnp.asarray(cond), jax.random.PRNGKey(0), n_timesteps=2))
        np.testing.assert_allclose(jout, tout, atol=5e-4)
