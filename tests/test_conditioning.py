"""Conditioning stack parity: CAMPPlus, RepCodec, w2v-bert vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import CAMPPlusConfig, RepCodecConfig, W2VBertConfig
from voice_tts_tpu.models.conditioning import CAMPPlus, RepCodec, Wav2Vec2Bert
from voice_tts_tpu.models.conditioning.repcodec import repcodec_vq2emb
from voice_tts_tpu.utils.checkpoint import (
    convert_campplus, convert_repcodec, convert_w2v_bert,
)

from tests.reference_oracle import install_reference, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")


@needs_ref
def test_campplus_parity():
    install_reference()
    import torch
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus as RefCAMPPlus

    torch.manual_seed(0)
    ref = RefCAMPPlus(feat_dim=80, embedding_size=192)
    # randomize batchnorm running stats so parity exercises them
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand_like(buf) + 0.5)
    ref.eval()

    rng = np.random.default_rng(0)
    feat = rng.normal(size=(1, 130, 80)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feat)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_campplus(sd)
    ours = np.asarray(CAMPPlus(CAMPPlusConfig(embedding_size=192)).apply(params, feat))
    assert ours.shape == ref_out.shape == (1, 192)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


@needs_ref
def test_repcodec_parity():
    install_reference()
    import torch
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import (
        RepCodec as RefRepCodec,
    )

    torch.manual_seed(1)
    ref = RefRepCodec(codebook_size=64, hidden_size=32, codebook_dim=8,
                      vocos_dim=16, vocos_intermediate_dim=32, vocos_num_layers=2)
    ref.eval()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 11, 32)).astype(np.float32)
    with torch.no_grad():
        ref_idx, ref_emb = ref.quantize(torch.from_numpy(x))

    cfg = RepCodecConfig(codebook_size=64, hidden_size=32, codebook_dim=8,
                         vocos_dim=16, vocos_intermediate_dim=32,
                         vocos_num_layers=2)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_repcodec(sd)
    model = RepCodec(cfg)
    idx, emb = model.apply(params, x)

    np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())
    np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(), atol=1e-5,
                               rtol=1e-4)

    # vq2emb path (feeds s2mel, reference `infer_v2.py:716-718`)
    with torch.no_grad():
        ref_v = ref.quantizer.vq2emb(ref_idx.unsqueeze(0)).transpose(1, 2).numpy()
    ours_v = np.asarray(repcodec_vq2emb(params, np.asarray(idx)))
    np.testing.assert_allclose(ours_v, ref_v, atol=1e-5, rtol=1e-4)


def test_w2v_bert_parity():
    import torch
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, feature_projection_input_dim=16,
        position_embeddings_type="relative_key",
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        conv_depthwise_kernel_size=7,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, conformer_conv_dropout=0.0, layerdrop=0.0,
        add_adapter=False,
    )
    torch.manual_seed(2)
    ref = Wav2Vec2BertModel(hf_cfg).eval()

    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 9, 16)).astype(np.float32)
    with torch.no_grad():
        out = ref(input_features=torch.from_numpy(feats),
                  output_hidden_states=True)

    cfg = W2VBertConfig(hidden_size=32, num_layers=2, num_heads=4,
                        intermediate_size=64, feature_projection_input_dim=16,
                        output_layer=2, left_max_position_embeddings=8,
                        right_max_position_embeddings=2, conv_kernel_size=7)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_w2v_bert(sd, output_layer=2)
    ours = np.asarray(Wav2Vec2Bert(cfg).apply(params, feats))

    # output_layer=2 -> hidden_states[2] (output of layer index 1)
    ref_h = out.hidden_states[2].numpy()
    np.testing.assert_allclose(ours, ref_h, atol=2e-5, rtol=1e-4)

    # truncated tap: output_layer=1 == hidden_states[1]
    params1 = convert_w2v_bert(sd, output_layer=1)
    cfg1 = W2VBertConfig(**{**cfg.__dict__, "output_layer": 1})
    ours1 = np.asarray(Wav2Vec2Bert(cfg1).apply(params1, feats))
    np.testing.assert_allclose(ours1, out.hidden_states[1].numpy(), atol=2e-5,
                               rtol=1e-4)


@needs_ref
def test_campplus_masked_padding_parity():
    """Padded fbank + valid_len must equal the reference on the exact length."""
    install_reference()
    import torch
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus as RefCAMPPlus

    torch.manual_seed(3)
    ref = RefCAMPPlus(feat_dim=80, embedding_size=192)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand_like(buf) + 0.5)
    ref.eval()

    rng = np.random.default_rng(4)
    true_len = 117
    feat = rng.normal(size=(1, true_len, 80)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feat)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_campplus(sd)
    padded = np.zeros((1, 160, 80), dtype=np.float32)
    padded[:, :true_len] = feat
    ours = np.asarray(CAMPPlus(CAMPPlusConfig(embedding_size=192)).apply(
        params, padded, jnp.asarray([true_len])))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=2e-3)


@needs_ref
def test_repcodec_reconstruction_parity():
    """Full autoencode (down -> encode -> vq -> decode -> up) vs reference."""
    install_reference()
    import torch
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import (
        RepCodec as RefRepCodec,
    )

    torch.manual_seed(7)
    ref = RefRepCodec(codebook_size=64, hidden_size=32, codebook_dim=8,
                      vocos_dim=16, vocos_intermediate_dim=32,
                      vocos_num_layers=2, downsample_scale=2)
    ref.eval()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 12, 32)).astype(np.float32)
    with torch.no_grad():
        ref_rec, _, _ = ref(torch.from_numpy(x))

    cfg = RepCodecConfig(codebook_size=64, hidden_size=32, codebook_dim=8,
                         vocos_dim=16, vocos_intermediate_dim=32,
                         vocos_num_layers=2, downsample_scale=2)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_repcodec(sd)
    ours = np.asarray(RepCodec(cfg).apply(params, jnp.asarray(x),
                                          method=RepCodec.reconstruct))
    assert ours.shape == tuple(ref_rec.shape)
    np.testing.assert_allclose(ours, ref_rec.numpy(), atol=1e-5, rtol=1e-4)
