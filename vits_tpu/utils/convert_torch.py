"""Convert reference (Aloento/VITS) torch checkpoints -> vits_tpu params.

Lets users of the torch reference migrate trained checkpoints directly: the
module graph is isomorphic (SURVEY.md §2.1), only layouts differ:

  torch Conv1d weight [out, in, k]          -> flax kernel [k, in, out]
  torch ConvTranspose1d weight [in, out, k] -> flax kernel [k, in, out]
  weight-norm (weight_v, weight_g)          -> (kernel, g)  (same math)
  nn.Embedding weight                       -> nn.Embed embedding
  torch LayerNorm (weight, bias)            -> flax (scale, bias)

Entry point: `convert_synthesizer(state_dict) -> {'params': ...}` for the
generator; `convert_discriminator(state_dict)` for Avocodo. The reference's
eval checkpoints store the generator under 'model' (utils.py:91-116).
"""

from __future__ import annotations

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, prefix, weight_norm=False, transpose=False, bias=True):
    """torch conv prefix -> flax Conv1d/ConvTranspose1d param dict."""
    out = {}
    if weight_norm:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"])
        if transpose:  # [in, out, k] -> [k, in, out]; g over dim0 = in
            out["kernel"] = v.transpose(2, 0, 1)
            out["g"] = g.reshape(-1)
        else:  # [out, in, k] -> [k, in, out]; g over dim0 = out
            out["kernel"] = v.transpose(2, 1, 0)
            out["g"] = g.reshape(-1)
    else:
        w = _np(sd[f"{prefix}.weight"])
        out["kernel"] = w.transpose(2, 0, 1) if transpose else w.transpose(2, 1, 0)
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.gamma"]) if f"{prefix}.gamma" in sd
            else _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.beta"]) if f"{prefix}.beta" in sd
            else _np(sd[f"{prefix}.bias"])}


def _wavenet(sd, prefix, n_layers, has_cond):
    out = {}
    if has_cond:
        out["cond_layer"] = _conv(sd, f"{prefix}.cond_layer", weight_norm=True)
    for i in range(n_layers):
        out[f"in_{i}"] = _conv(sd, f"{prefix}.in_layers.{i}", weight_norm=True)
        out[f"res_skip_{i}"] = _conv(
            sd, f"{prefix}.res_skip_layers.{i}", weight_norm=True
        )
    return out


def _ddsconv(sd, prefix, n_layers):
    out = {}
    for i in range(n_layers):
        out[f"sep_{i}"] = _conv(sd, f"{prefix}.convs_sep.{i}")
        out[f"pointwise_{i}"] = _conv(sd, f"{prefix}.convs_1x1.{i}")
        out[f"norm1_{i}"] = _layernorm(sd, f"{prefix}.norms_1.{i}")
        out[f"norm2_{i}"] = _layernorm(sd, f"{prefix}.norms_2.{i}")
    return out


def _posterior_encoder(sd, prefix, n_layers=16, has_cond=True):
    return {
        "pre": _conv(sd, f"{prefix}.pre"),
        "enc": _wavenet(sd, f"{prefix}.enc", n_layers, has_cond),
        "proj": _conv(sd, f"{prefix}.proj"),
    }


def _coupling_block(sd, prefix, n_flows=4, n_layers=4, has_cond=True):
    out = {}
    for i in range(n_flows):
        cp = f"{prefix}.flows.{2 * i}"
        out[f"coupling_{i}"] = {
            "pre": _conv(sd, f"{cp}.pre"),
            "enc": _wavenet(sd, f"{cp}.enc", n_layers, has_cond),
            "post": _conv(sd, f"{cp}.post"),
        }
    return out


def _elementwise_affine(sd, prefix):
    return {"m": _np(sd[f"{prefix}.m"]).reshape(-1),
            "logs": _np(sd[f"{prefix}.logs"]).reshape(-1)}


def _conv_flow(sd, prefix, n_layers=3):
    return {
        "pre": _conv(sd, f"{prefix}.pre"),
        "convs": _ddsconv(sd, f"{prefix}.convs", n_layers),
        "proj": _conv(sd, f"{prefix}.proj"),
    }


def _sdp(sd, prefix, n_flows=4, has_cond=True):
    out = {
        "pre": _conv(sd, f"{prefix}.pre"),
        "proj": _conv(sd, f"{prefix}.proj"),
        "convs": _ddsconv(sd, f"{prefix}.convs", 3),
        "post_pre": _conv(sd, f"{prefix}.post_pre"),
        "post_proj": _conv(sd, f"{prefix}.post_proj"),
        "post_convs": _ddsconv(sd, f"{prefix}.post_convs", 3),
        "flow_pre": _elementwise_affine(sd, f"{prefix}.flows.0"),
        "post_flow_pre": _elementwise_affine(sd, f"{prefix}.post_flows.0"),
    }
    for i in range(n_flows):
        out[f"flow_{i}"] = _conv_flow(sd, f"{prefix}.flows.{1 + 2 * i}")
    for i in range(4):
        out[f"post_flow_{i}"] = _conv_flow(sd, f"{prefix}.post_flows.{1 + 2 * i}")
    if has_cond:
        out["cond"] = _conv(sd, f"{prefix}.cond")
    return out


def _attention(sd, prefix):
    out = {
        "conv_q": _conv(sd, f"{prefix}.conv_q"),
        "conv_k": _conv(sd, f"{prefix}.conv_k"),
        "conv_v": _conv(sd, f"{prefix}.conv_v"),
        "conv_o": _conv(sd, f"{prefix}.conv_o"),
    }
    if f"{prefix}.emb_rel_k" in sd:
        out["emb_rel_k"] = _np(sd[f"{prefix}.emb_rel_k"])
        out["emb_rel_v"] = _np(sd[f"{prefix}.emb_rel_v"])
    return out


def _text_encoder(sd, prefix, n_layers=6):
    enc = {}
    for i in range(n_layers):
        enc[f"attn_{i}"] = _attention(sd, f"{prefix}.encoder.attn_layers.{i}")
        enc[f"norm1_{i}"] = _layernorm(sd, f"{prefix}.encoder.norm_layers_1.{i}")
        enc[f"ffn_{i}"] = {
            "conv_1": _conv(sd, f"{prefix}.encoder.ffn_layers.{i}.conv_1"),
            "conv_2": _conv(sd, f"{prefix}.encoder.ffn_layers.{i}.conv_2"),
        }
        enc[f"norm2_{i}"] = _layernorm(sd, f"{prefix}.encoder.norm_layers_2.{i}")
    return {
        "emb": {"embedding": _np(sd[f"{prefix}.emb.weight"])},
        "emb_t": {"embedding": _np(sd[f"{prefix}.emb_t.weight"])},
        "encoder": enc,
        "proj": _conv(sd, f"{prefix}.proj"),
    }


def _hifigan(sd, prefix, n_ups=4, n_kernels=3, resblock_convs=3):
    out = {
        "conv_pre": _conv(sd, f"{prefix}.conv_pre"),
    }
    if f"{prefix}.cond.weight" in sd:
        out["cond"] = _conv(sd, f"{prefix}.cond")
    for i in range(n_ups):
        out[f"up_{i}"] = _conv(
            sd, f"{prefix}.ups.{i}", weight_norm=True, transpose=True
        )
        for j in range(n_kernels):
            rb = {}
            rp = f"{prefix}.resblocks.{i * n_kernels + j}"
            for k in range(resblock_convs):
                rb[f"conv1_{k}"] = _conv(sd, f"{rp}.convs1.{k}", weight_norm=True)
                rb[f"conv2_{k}"] = _conv(sd, f"{rp}.convs2.{k}", weight_norm=True)
            out[f"resblock_{i}_{j}"] = rb
    for i in range(3):
        out[f"conv_post_{i}"] = _conv(sd, f"{prefix}.conv_posts.{i}", bias=False)
    return out


def _ying_decoder(sd, prefix, n_layers=4, has_cond=True):
    return {
        "pre": _conv(sd, f"{prefix}.pre"),
        "dec": _wavenet(sd, f"{prefix}.dec", n_layers, has_cond),
        "proj": _conv(sd, f"{prefix}.proj"),
    }


def convert_synthesizer(
    sd: dict,
    n_layers_text: int = 6,
    n_kernels: int = 3,
    resblock_convs: int = 3,
    n_ups: int = 4,
) -> dict:
    """Reference SynthesizerTrn state_dict -> flax variables {'params': ...}."""
    sd = {k.replace("module.", "", 1): v for k, v in sd.items()}
    has_cond = "flow.flows.0.enc.cond_layer.weight_v" in sd
    params = {
        "text_encoder": _text_encoder(sd, "text_encoder", n_layers_text),
        "posterior_encoder": _posterior_encoder(sd, "posterior_encoder", 16, has_cond),
        "pitch_encoder": _posterior_encoder(sd, "pitch_encoder", 16, has_cond),
        "flow": _coupling_block(sd, "flow", 4, 4, has_cond),
        "duration_predictor": _sdp(sd, "duration_predictor", 4, has_cond),
        "waveform_decoder": _hifigan(
            sd, "waveform_decoder", n_ups, n_kernels, resblock_convs
        ),
        "yin_decoder": _ying_decoder(sd, "yin_decoder", 4, has_cond),
        "emb_g": {"embedding": _np(sd["emb_g.weight"])},
    }
    return {"params": params}


def _combd_block(sd, prefix, n_convs=6):
    out = {}
    for i in range(n_convs):
        out[f"conv_{i}"] = _conv(sd, f"{prefix}.convs.{i}", weight_norm=True)
    out["projection"] = _conv(sd, f"{prefix}.projection_conv", weight_norm=True)
    return out


def _mdc(sd, prefix, n_dconvs=3):
    out = {}
    for i in range(n_dconvs):
        out[f"dconv_{i}"] = _conv(sd, f"{prefix}.d_convs.{i}", weight_norm=True)
    out["post"] = _conv(sd, f"{prefix}.post_conv", weight_norm=True)
    return out


def _sbd_block(sd, prefix, n_mdcs=5):
    out = {}
    for i in range(n_mdcs):
        out[f"mdc_{i}"] = _mdc(sd, f"{prefix}.convs.{i}")
    out["post"] = _conv(sd, f"{prefix}.post_conv", weight_norm=True)
    return out


def convert_discriminator(sd: dict) -> dict:
    """Reference AvocodoDiscriminator state_dict -> flax variables."""
    sd = {k.replace("module.", "", 1): v for k, v in sd.items()}
    combd = {f"block_{i}": _combd_block(sd, f"combd.blocks.{i}") for i in range(3)}
    sbd = {f"disc_{i}": _sbd_block(sd, f"sbd.discriminators.{i}") for i in range(4)}
    return {"params": {"combd": combd, "sbd": sbd}}


# ---------------------------------------------------------------------------
# File-level migration CLI: reference .pth -> Orbax checkpoint dirs.
# ---------------------------------------------------------------------------

def _detect_arch(sd: dict) -> dict:
    """Read architecture hyperparameters off the state-dict key structure,
    so conversion needs no hand-supplied flags."""
    import re as _re

    def _count(pattern):
        idx = {
            int(m.group(1))
            for k in sd
            for m in [_re.match(pattern, k)]
            if m
        }
        return (max(idx) + 1) if idx else 0

    n_layers_text = _count(r"text_encoder\.encoder\.attn_layers\.(\d+)\.")
    n_ups = _count(r"waveform_decoder\.ups\.(\d+)\.")
    n_resblocks = _count(r"waveform_decoder\.resblocks\.(\d+)\.")
    resblock_convs = _count(r"waveform_decoder\.resblocks\.0\.convs1\.(\d+)\.")
    return dict(
        n_layers_text=n_layers_text,
        n_ups=n_ups,
        n_kernels=n_resblocks // max(n_ups, 1),
        resblock_convs=resblock_convs,
    )


def convert_checkpoint_file(
    eval_pth: str,
    out_dir: str,
    step: int | None = None,
    train_pth: str | None = None,
) -> str:
    """Convert a reference `{name}_Eval_{step}.pth` into an Orbax
    `eval_{step}` directory that TTSEngine / load_eval_params load
    directly. With train_pth, additionally converts the discriminator from
    `{name}_Train_{step}.pth` into `disc_{step}` (raw params tree, for
    GAN fine-tuning via checkpoint.merge_compatible; reference optimizer
    moments are torch-AdamW-specific and are not carried over).

    Returns the eval checkpoint path. Reference format:
    /root/reference/utils.py:91-116 ({'model_g': ...} / {'model_d': ...}).
    """
    import os as _os

    import torch
    import orbax.checkpoint as ocp

    payload = torch.load(eval_pth, map_location="cpu", weights_only=True)
    sd = payload.get("model_g", payload.get("model", payload))
    arch = _detect_arch(sd)
    converted = convert_synthesizer(
        sd,
        n_layers_text=arch["n_layers_text"],
        n_kernels=arch["n_kernels"],
        resblock_convs=arch["resblock_convs"],
        n_ups=arch["n_ups"],
    )
    if step is None:
        import re as _re

        digits = _re.findall(r"(\d+)", _os.path.basename(eval_pth))
        step = int(digits[-1]) if digits else 0

    ckptr = ocp.StandardCheckpointer()
    eval_path = _os.path.join(_os.path.abspath(out_dir), f"eval_{step}")
    ckptr.save(eval_path, {"g_params": converted["params"]})
    if train_pth is not None:
        tpayload = torch.load(train_pth, map_location="cpu", weights_only=True)
        dsd = tpayload.get("model_d", tpayload)
        dconv = convert_discriminator(dsd)
        ckptr.save(
            _os.path.join(_os.path.abspath(out_dir), f"disc_{step}"),
            {"d_params": dconv["params"]},
        )
    ckptr.wait_until_finished()
    return eval_path


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference (torch) VITS checkpoint into this "
        "repo's Orbax format. Usage: python -m vits_tpu.utils.convert_torch "
        "Model_Eval_10000.pth --out-dir exp/converted"
    )
    ap.add_argument("eval_pth", help="reference {name}_Eval_{step}.pth")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--train-pth", default=None,
                    help="optional {name}_Train_{step}.pth (discriminator)")
    ap.add_argument("--step", type=int, default=None,
                    help="step id for the output dir (default: from filename)")
    args = ap.parse_args()
    path = convert_checkpoint_file(
        args.eval_pth, args.out_dir, step=args.step, train_pth=args.train_pth
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
