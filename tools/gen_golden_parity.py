"""Generate the end-to-end reference-parity golden.

Runs the ACTUAL reference Model (/root/reference/model.py:631-719) on
this image's CPU torch (with the same four import stubs
tools/bench_reference.py uses), records its state_dict plus
forward-logits/loss and greedy-decode tokens on fixed inputs, and
stores everything to tests/golden/reference_parity.npz — so
tests/test_reference_parity.py can assert, without torch, that weight
transplantation through asr_model_tpu.compat reproduces the reference's
numbers (VERDICT r2 "What's missing #1").

Controlled variable: gumbel noise.  Both AbbyNormal mode routing
(model.py:70) and the MSheath jump policy (model.py:476) draw
F.gumbel_softmax samples from torch's global RNG; those draws cannot be
replicated in another framework's RNG stream, so the golden is
generated with gumbel_softmax pinned to its noise-free limit (hard
one-hot of the logits' argmax) — exactly what this framework's
eval-mode routing computes when no "gumbel" rng is provided
(models/stochastic.py:15-31).  Everything else (all weights, norms,
convs, rotary, attention, the MSheath layer recurrence and jump
control flow, the a/b/c/d/e/f/g block dataflow, CE loss, the greedy
loop) is exercised as-is.

Run: python tools/gen_golden_parity.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

sys.path.insert(0, os.path.join(REPO, "tools"))
from bench_reference import _install_stubs  # noqa: E402

# golden config: small dims for a small artifact; layer MUST be 4 so
# the router's Linear(dims*num_types, num_types) matches its input of
# (layer-1) stacked modalities (model.py:541,553-556 — the reference
# only runs at layer == num_types + 1)
CFG = dict(tokens=256, mels=16, dims=64, head=2, layer=4, act="gelu",
           n_type="AbbyNormal")
T_AUDIO = 40
T_TEXT = 6
MAX_NEW = 8
OUT = os.path.join(REPO, "tests", "golden", "reference_parity.npz")


def _det_gumbel_softmax(logits, tau=1.0, hard=False, eps=1e-10, dim=-1):
    """F.gumbel_softmax without the gumbel noise (see module docstring)."""
    import torch.nn.functional as F

    y = F.softmax(logits / tau, dim=dim)
    if not hard:
        return y
    idx = y.argmax(dim=dim, keepdim=True)
    y_hard = (0 * y).scatter_(dim, idx, 1.0)
    return y_hard + y - y.detach()


def main():
    _install_stubs()
    import torch
    import torch.nn.functional

    torch.nn.functional.gumbel_softmax = _det_gumbel_softmax

    sys.path.insert(0, REFERENCE)
    import model as ref_model  # the reference, read-only

    torch.manual_seed(0)
    dims = ref_model.Dimensions(**CFG)
    net = ref_model.Model(dims).eval()

    rng = np.random.RandomState(0)
    spec = rng.randn(1, CFG["mels"], T_AUDIO).astype(np.float32)
    pitch = np.abs(rng.randn(1, 1, T_AUDIO)).astype(np.float32)
    wave = rng.randn(1, 1, T_AUDIO).astype(np.float32)
    ids = rng.randint(3, CFG["tokens"], size=(1, T_TEXT)).astype(np.int64)
    labels = np.concatenate([ids[:, 1:], [[2]]], axis=1)
    labels[0, -2] = 0  # exercise CE ignore_index=0 (model.py:670)

    t = lambda x: torch.tensor(x)
    with torch.no_grad():
        out = net(labels=t(labels), text_ids=t(ids), spectrogram=t(spec),
                  pitch=t(pitch), waveform=t(wave))
        y = net.generate(spectrogram=t(spec), pitch=t(pitch),
                         waveform=t(wave), max_new_tokens=MAX_NEW)

    sd_np = {k: v.numpy().copy() for k, v in net.state_dict().items()}

    # float64 pass: same weights, double precision — distinguishes
    # exact-math parity from f32 accumulation noise.  The reference's
    # compute dtype is the module global (model.py:16/essentials.py:16),
    # consumed by every .to(device, dtype) and arange/linspace — flip
    # both modules' globals so activations stay f64 end to end.
    import essentials as ref_essentials
    ref_model.dtype = torch.float64
    ref_essentials.dtype = torch.float64
    net64 = net.double()
    t64 = lambda x: torch.tensor(x, dtype=torch.float64)
    with torch.no_grad():
        out64 = net64(labels=t(labels), text_ids=t(ids),
                      spectrogram=t64(spec), pitch=t64(pitch),
                      waveform=t64(wave))

    data = {
        "cfg_tokens": CFG["tokens"], "cfg_mels": CFG["mels"],
        "cfg_dims": CFG["dims"], "cfg_head": CFG["head"],
        "cfg_layer": CFG["layer"],
        "in_spectrogram": spec, "in_pitch": pitch, "in_waveform": wave,
        "in_text_ids": ids, "in_labels": labels,
        "out_logits": out["logits"].numpy(),
        "out_loss": np.float32(out["loss"].item()),
        "out_generate": y.numpy(),
        "out_logits64": out64["logits"].numpy(),
        "out_loss64": np.float64(out64["loss"].item()),
        "max_new_tokens": MAX_NEW,
    }
    for k, v in sd_np.items():
        data["sd:" + k] = v

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.2f} MB, "
          f"{len(data)} entries)")
    print("loss:", data["out_loss"])
    print("generate:", data["out_generate"])


if __name__ == "__main__":
    main()
