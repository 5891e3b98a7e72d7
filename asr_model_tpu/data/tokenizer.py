"""Byte-level BPE tokenizer engine.

A standalone implementation of the HF ``tokenizers`` pipeline that the
reference loads from tokenizer.json (essentials.py:256-295): NFKC
normalizer -> ByteLevel pre-tokenizer (add_prefix_space=True,
use_regex=True, GPT-2 split pattern) -> BPE (40k vocab, 39,741 merges,
no unk/byte-fallback) -> ByteLevel decoder.  Specials <PAD>=0 <BOS>=1
<EOS>=2.

Bit-parity contract: ``Tokenizer.encode`` must return the same ids and
``decode`` the same strings as the Rust crate for any input (golden
tests in tests/test_tokenizer.py check this against the ``tokenizers``
package available in the dev image).

A C++ engine (native/bpe.cpp, loaded via ctypes) accelerates the merge
loop when built; this module is the always-available reference path and
the correctness oracle for the native engine.
"""

from __future__ import annotations

import functools
import json
import os
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

try:
    import regex as _re
    _SPLIT = _re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")
except ImportError:  # pragma: no cover - regex is in the image
    _re = None
    _SPLIT = None


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte->unicode visible-char table (the ByteLevel alphabet)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class Tokenizer:
    """Byte-level BPE encode/decode with HF-tokenizers-parity semantics."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 added_tokens: Optional[Dict[str, int]] = None,
                 add_prefix_space: bool = True, normalize_nfkc: bool = True):
        self.vocab = dict(vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.added_tokens = dict(added_tokens or {})
        self.add_prefix_space = add_prefix_space
        self.normalize_nfkc = normalize_nfkc
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: Dict[str, List[str]] = {}
        self.pad_token_id = 0
        self.bos_token_id = 1
        self.eos_token_id = 2
        self._native = None  # optional C++ engine, see native/bpe.cpp

    # ---------------------------------------------------------------- load
    @classmethod
    def from_file(cls, path: str) -> "Tokenizer":
        with open(path, encoding="utf-8") as f:
            blob = json.load(f)
        model = blob["model"]
        merges = [tuple(m) if isinstance(m, list) else tuple(m.split(" "))
                  for m in model["merges"]]
        added = {t["content"]: t["id"] for t in blob.get("added_tokens", [])}
        pre = blob.get("pre_tokenizer") or {}
        norm = blob.get("normalizer") or {}
        tok = cls(model["vocab"], merges, added_tokens=added,
                  add_prefix_space=pre.get("add_prefix_space", True),
                  normalize_nfkc=(norm.get("type") == "NFKC"))
        return tok

    # -------------------------------------------------------- native engine
    def enable_native(self) -> bool:
        """Load (building if needed) the C++ merge engine
        (native/bpe.cpp).  Returns True when active; falls back to the
        pure-Python loop otherwise."""
        if self._native is not None:
            return True
        from asr_model_tpu import native as native_mod
        import ctypes
        lib = native_mod.load("bpe")
        if lib is None:
            return False
        handle = lib.bpe_new()
        for tok, tid in self.vocab.items():
            lib.bpe_add_token(handle, tok.encode("utf-8"), tid)
        for (a, b), rank in self.ranks.items():
            lib.bpe_add_merge(handle, a.encode("utf-8"),
                              b.encode("utf-8"), rank)
        buf = (ctypes.c_int * 4096)()
        self._native = (lib, handle, buf)
        return True

    def _encode_word_ids(self, mapped: str) -> List[int]:
        """mapped byte-level word -> ids (native fast path or Python)."""
        if self._native is not None:
            lib, handle, buf = self._native
            n = lib.bpe_encode_word(handle, mapped.encode("utf-8"),
                                    buf, len(buf))
            return list(buf[:n])
        out = []
        for sub in self._bpe(mapped):
            tid = self.vocab.get(sub)
            if tid is not None:
                out.append(tid)
        return out

    # ----------------------------------------------------------------- bpe
    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token)
        if len(word) == 1:
            self._cache[token] = [token]
            return [token]
        pairs = _get_pairs(word)
        while True:
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            first, second = best
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                if j < len(word) - 1 and word[j + 1] == second:
                    new_word.append(first + second)
                    i = j + 2
                else:
                    new_word.append(word[j])
                    i = j + 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    # -------------------------------------------------------------- encode
    def _split_on_added(self, text: str) -> List[Tuple[str, Optional[int]]]:
        """Split out added (special) tokens, which match pre-normalization."""
        if not self.added_tokens:
            return [(text, None)]
        segments: List[Tuple[str, Optional[int]]] = [(text, None)]
        for content, tid in self.added_tokens.items():
            nxt: List[Tuple[str, Optional[int]]] = []
            for seg, seg_id in segments:
                if seg_id is not None or content not in seg:
                    nxt.append((seg, seg_id))
                    continue
                parts = seg.split(content)
                for i, part in enumerate(parts):
                    if part:
                        nxt.append((part, None))
                    if i < len(parts) - 1:
                        nxt.append((content, tid))
            segments = nxt
        return segments

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        """Text -> ids.  Matches the reference wrapper (essentials.py:262-267):
        the raw pipeline adds no specials; add_special_tokens=False
        additionally strips any special ids that appeared literally."""
        ids: List[int] = []
        for seg, seg_id in self._split_on_added(text):
            if seg_id is not None:
                ids.append(seg_id)
                continue
            if self.normalize_nfkc:
                seg = unicodedata.normalize("NFKC", seg)
            if self.add_prefix_space and seg and not seg.startswith(" "):
                seg = " " + seg
            for piece in _SPLIT.findall(seg):
                mapped = "".join(self.byte_encoder[b]
                                 for b in piece.encode("utf-8"))
                ids.extend(self._encode_word_ids(mapped))
        if not add_special_tokens:
            special = set(self.added_tokens.values())
            ids = [i for i in ids if i not in special]
        return ids

    # -------------------------------------------------------------- decode
    def _decode_raw(self, ids: Iterable[int]) -> str:
        text = "".join(self.inv_vocab.get(int(i), "") for i in ids)
        data = bytearray()
        for ch in text:
            b = self.byte_decoder.get(ch)
            if b is None:
                data.extend(ch.encode("utf-8"))
            else:
                data.append(b)
        # the ByteLevel decoder is a pure byte decode: the prefix space
        # added at encode time is NOT stripped (HF crate behavior)
        return data.decode("utf-8", errors="replace")

    def decode(self, ids, pad_token_id=0, bos_token_id=1, eos_token_id=2) -> str:
        """Strip {pad,bos,eos,-100} then byte-decode (essentials.py:280-282)."""
        ids = _to_list(ids)
        skip = (pad_token_id, bos_token_id, eos_token_id, -100)
        return self._decode_raw(int(i) for i in ids if int(i) not in skip)

    def batch_decode(self, ids_list, pad_token_id=0, bos_token_id=1,
                     eos_token_id=2, skip_special_tokens=True) -> List[str]:
        ids_list = _to_list(ids_list)
        return [self.decode(ids, pad_token_id, bos_token_id, eos_token_id)
                for ids in ids_list]

    def token_to_id(self, token: str) -> Optional[int]:
        return self.added_tokens.get(token, self.vocab.get(token))

    def get_vocab_size(self) -> int:
        return len(self.vocab)

    def save_pretrained(self, save_dir: str) -> None:
        os.makedirs(save_dir, exist_ok=True)
        self.save(os.path.join(save_dir, "tokenizer.json"))

    def save(self, path: str) -> None:
        blob = {
            "version": "1.0",
            "truncation": None,
            "padding": None,
            "added_tokens": [
                {"id": tid, "content": c, "single_word": False,
                 "lstrip": False, "rstrip": False, "normalized": False,
                 "special": True}
                for c, tid in sorted(self.added_tokens.items(),
                                     key=lambda kv: kv[1])],
            "normalizer": {"type": "NFKC"} if self.normalize_nfkc else None,
            "pre_tokenizer": {"type": "ByteLevel",
                              "add_prefix_space": self.add_prefix_space,
                              "trim_offsets": True, "use_regex": True},
            "post_processor": None,
            "decoder": {"type": "ByteLevel",
                        "add_prefix_space": self.add_prefix_space,
                        "trim_offsets": True, "use_regex": True},
            "model": {
                "type": "BPE", "dropout": None, "unk_token": None,
                "continuing_subword_prefix": None,
                "end_of_word_suffix": None, "fuse_unk": False,
                "byte_fallback": False, "ignore_merges": False,
                "vocab": self.vocab,
                "merges": [list(p) for p, _ in
                           sorted(self.ranks.items(), key=lambda kv: kv[1])],
            },
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(blob, f, ensure_ascii=False)


def _to_list(x):
    if hasattr(x, "tolist"):
        return x.tolist()
    return x


def setup_tokenizer(path: str) -> Tokenizer:
    """Parity entry point (essentials.py:256-295): loads tokenizer.json
    and pins pad/bos/eos = 0/1/2."""
    tok = Tokenizer.from_file(path)
    tok.pad_token_id = 0
    tok.bos_token_id = 1
    tok.eos_token_id = 2
    return tok
