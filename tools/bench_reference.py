"""Measure the REFERENCE implementation's decode throughput on this
image's hardware and record it to BASELINE_MEASURED.json.

The reference (sine2pi/ASR-model) is PyTorch; this image has torch-CPU
only (no CUDA), so the baseline is the reference running on the host
CPU — the only hardware it can run on here.  BASELINE_MEASURED.json
records the hardware explicitly so the vs_baseline comparison in
bench.py is an honest cross-hardware statement (TPU framework vs the
reference on host CPU), not a like-for-like chip comparison.

The reference's import graph needs four packages absent from this
image (tensordict, torchaudio, pyworld, soundfile).  Only tensordict
is used by the benched code path (Model.generate); the others are
runtime-only inside feature-extraction functions we never call.  All
four are stubbed below — the reference source itself is untouched and
read-only.

Workload (matches bench.py except batch size): 10 s utterances, all
three live modalities (spectrogram 128x1001, pitch 1x1001, waveform
1x1001 at the 10 ms frame rate), greedy decode, 64-token budget,
flagship config (dims=512, head=4, layer=4, 40k vocab).  Batch is 1
because the reference cannot batch: its rotary magnitude broadcast
fails at B>1 (model.py:201-205).  Decode cost per step is
dominated by the per-block re-encoding of all three 1001-frame
modality streams (model.py:617-626), which does not depend on the
prefix length — so the per-token cost is measured over a few steps and
scaled to the 64-token budget (method recorded in the JSON).

Run: python tools/bench_reference.py [--steps 4]
"""

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _install_stubs():
    import torch

    class TensorDict(dict):
        """Minimal stand-in for tensordict.TensorDict covering the
        reference Model's usage: dict construction with batch_size,
        .apply, .clone, .to, item access/assignment."""

        def __init__(self, data=None, batch_size=None):
            super().__init__({k: v for k, v in (data or {}).items()})
            self.batch_size = batch_size

        def __getitem__(self, key):
            # the reference's processor reads xa['pt'] even when absent
            # (model.py:608) and its live path runs, so the author's
            # tensordict returns None for missing keys — match that
            return self.get(key)

        def apply(self, fn):
            # real tensordict drops entries whose fn returns None —
            # no_none (essentials.py:32-33) relies on this to strip
            # the 'pt': None slot before the encoder runs
            out = {}
            for k, v in self.items():
                r = fn(v) if v is not None else None
                if r is not None:
                    out[k] = r
            return TensorDict(out, self.batch_size)

        def clone(self):
            return TensorDict(
                {k: (v.clone() if torch.is_tensor(v) else v)
                 for k, v in self.items()}, self.batch_size)

        def to(self, device):
            return TensorDict(
                {k: (v.to(device) if torch.is_tensor(v) else v)
                 for k, v in self.items()}, self.batch_size)

    td = types.ModuleType("tensordict")
    td.TensorDict = TensorDict
    sys.modules.setdefault("tensordict", td)

    ta = types.ModuleType("torchaudio")
    ta.transforms = types.ModuleType("torchaudio.transforms")
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio.transforms", ta.transforms)

    sys.modules.setdefault("pyworld", types.ModuleType("pyworld"))
    sys.modules.setdefault("soundfile", types.ModuleType("soundfile"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4,
                    help="decode steps to time (per-step cost is "
                         "prefix-independent; scaled to the budget)")
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1,
                help="the reference is batch-1-only: its rotary "
                     "magnitude broadcast fails at B>1 "
                     "(model.py:201-205, SURVEY rotary note)")
    ap.add_argument("--utt-sec", type=float, default=10.0)
    args = ap.parse_args()

    _install_stubs()
    import numpy as np
    import torch

    sys.path.insert(0, REFERENCE)
    import model as ref_model  # noqa: E402  (the reference, read-only)

    dims = ref_model.Dimensions(tokens=40000, mels=128, dims=512, head=4,
                                layer=4, act="gelu", n_type="AbbyNormal")
    net = ref_model.Model(dims).eval()

    T = 1 + int(args.utt_sec * 16000) // 160          # 10 ms frames
    rng = np.random.RandomState(0)
    spec = torch.tensor(rng.randn(args.batch, 128, T), dtype=torch.float32)
    pitch = torch.tensor(np.abs(rng.randn(args.batch, 1, T)),
                         dtype=torch.float32)
    wave = torch.tensor(rng.randn(args.batch, 1, T), dtype=torch.float32)

    with torch.no_grad():
        # warm-up: one full short generate (compiles nothing, but pages
        # in weights and primes allocator)
        t0 = time.perf_counter()
        net.generate(spectrogram=spec, pitch=pitch, waveform=wave,
                     max_new_tokens=1)
        warm = time.perf_counter() - t0

        t0 = time.perf_counter()
        net.generate(spectrogram=spec, pitch=pitch, waveform=wave,
                     max_new_tokens=args.steps)
        elapsed = time.perf_counter() - t0

    # one generate(max_new_tokens=k) call runs the encoder once plus k
    # decoder passes; subtract the encoder cost (~= the 1-token warm-up
    # minus one decoder pass) conservatively by using per-step deltas
    per_step = (elapsed - warm) / max(args.steps - 1, 1)
    decode_time = warm + per_step * (args.budget - 1)
    audio_seconds = args.batch * args.utt_sec
    rtfx = audio_seconds / decode_time

    out = {
        "rtfx": round(rtfx, 4),
        "tokens_per_sec": round(args.budget * args.batch / decode_time, 3),
        "hardware": f"host CPU ({os.cpu_count()} core(s)), torch "
                    f"{torch.__version__} (no CUDA in image)",
        "workload": f"batch {args.batch}, {args.utt_sec:.0f}s utts, "
                    f"3 modalities ({T} frames), greedy decode "
                    f"{args.budget}-token budget, flagship 512d/40k",
        "method": f"per-step decode cost measured over {args.steps} "
                  f"steps and scaled to the {args.budget}-token budget "
                  "(per-step cost is prefix-independent: each step "
                  "re-encodes all three modality streams per block, "
                  "model.py:617-626)",
        "measured_seconds": {"warmup_1tok": round(warm, 3),
                             "steps_run": args.steps,
                             "elapsed": round(elapsed, 3),
                             "per_step": round(per_step, 3),
                             "decode_time_scaled": round(decode_time, 3)},
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
