"""Compact wire format for host->device feature upload.

The end-to-end submission pipeline is host/transfer-bound: the scoring scan
runs in ~55 ms on device while the raw int32 feature columns of the 385K-row
reference test split are ~37 MB of host->device traffic (and remote-tunnel
links degrade to tens of MB/s once compute is in flight). This module packs
the model-read columns into ONE uint8 buffer — a single transfer — at close
to the information content of the data, and unpacks on device with cheap
vectorized ops inside the scoring program:

* ids are width-reduced by their table's vocab bound (schema-static, never
  data-dependent): vocab <= 256 -> u8; <= 65536 -> u16; <= 131072 -> u16
  low half + a 1-bit-packed high bit (the MicroLens item vocab 91718 needs
  exactly 17 bits); larger or hashed (unbounded raw id) tables stay i32;
* sequences go RAGGED: a u8 length per row plus the width-reduced values
  (MicroLens histories average ~10 of max_len 20 — half the slots are pad),
  with the value buffer padded to a bucketed capacity so jit shapes repeat;
* everything is concatenated into one contiguous uint8 buffer so the upload
  is a single RPC regardless of feature count.

For the reference split this is ~10 MB on the wire instead of 37 MB.

Reconstruction is exact: sequence rows are rebuilt left-padded at the same
positions (first-non-pad structure preserved, so even a real id equal to
pad_id inside the window survives the round trip).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ctr_recommendation_tpu.config.schema import FeatureType
from ctr_recommendation_tpu.features.feature_map import FeatureMap

# vocab-bound -> byte code thresholds
_U8_MAX = 1 << 8
_U16_MAX = 1 << 16
_U17_MAX = 1 << 17


@dataclasses.dataclass(frozen=True)
class WireEntry:
    name: str
    is_seq: bool
    code: str  # "u8" | "u16" | "u16b" | "i32"
    max_len: int = 0
    pad_id: int = 0


@dataclasses.dataclass(frozen=True)
class WirePlan:
    entries: tuple[WireEntry, ...]


def _code_for(fm: FeatureMap, name: str) -> str:
    table = fm.table(fm.table_of[name])
    if table.hashed:
        return "i32"  # raw ids are unbounded; hashing happens on device
    v = table.vocab_size
    if v <= _U8_MAX:
        return "u8"
    if v <= _U16_MAX:
        return "u16"
    if v <= _U17_MAX:
        return "u16b"
    return "i32"


def build_wire_plan(fm: FeatureMap) -> WirePlan:
    """Packing plan for the model-read columns. PLACEHOLDER fields read no
    column and DENSE_EMBEDDING columns are joined on device (predictor)."""
    entries = []
    for f in fm.features:
        if f.type == FeatureType.CATEGORICAL:
            entries.append(WireEntry(f.name, False, _code_for(fm, f.name)))
        elif f.type == FeatureType.SEQUENCE:
            if f.max_len is None or f.max_len > 255:
                raise ValueError(
                    f"wire format needs max_len <= 255 for {f.name!r}"
                )
            entries.append(
                WireEntry(
                    f.name, True, _code_for(fm, f.name), f.max_len, f.pad_id
                )
            )
    return WirePlan(tuple(entries))


def value_capacity(total_len: int, n_rows: int, max_len: int) -> int:
    """Bucketed ragged-value capacity: jit sees at most 8 distinct shapes
    per (n_rows, max_len) instead of one per data-dependent total length."""
    grain = max(1024, n_rows * max_len // 8)
    cap = -(-max(total_len, 1) // grain) * grain
    return min(cap, n_rows * max_len)


@dataclasses.dataclass(frozen=True)
class WireLayout:
    """Static byte layout of one packed buffer: (entry, part) -> (offset,
    count). Parts: "data" (scalar/value payload), "len" (seq u8 lengths),
    "hi" (packed high bits for u16b)."""

    plan: WirePlan
    n_rows: int
    caps: tuple[int, ...]  # ragged value capacity per seq entry, plan order
    segments: tuple[tuple[str, str, str, int, int], ...]
    # (name, part, code, byte_offset, element_count)
    total_bytes: int


def compute_layout(
    plan: WirePlan, n_rows: int, caps: dict[str, int]
) -> WireLayout:
    segs = []
    off = 0
    cap_list = []
    for e in plan.entries:
        if e.is_seq:
            cap = caps[e.name]
            cap_list.append(cap)
            segs.append((e.name, "len", "u8", off, n_rows))
            off += n_rows
            segs.append((e.name, "data", e.code, off, cap))
            off += 2 * cap if e.code in ("u16", "u16b") else (
                cap if e.code == "u8" else 4 * cap
            )
            if e.code == "u16b":
                segs.append((e.name, "hi", "bits", off, cap))
                off += (cap + 7) // 8
        else:
            segs.append((e.name, "data", e.code, off, n_rows))
            off += 2 * n_rows if e.code in ("u16", "u16b") else (
                n_rows if e.code == "u8" else 4 * n_rows
            )
            if e.code == "u16b":
                segs.append((e.name, "hi", "bits", off, n_rows))
                off += (n_rows + 7) // 8
    return WireLayout(plan, n_rows, tuple(cap_list), tuple(segs), off)


def _seq_structure(col: np.ndarray, pad_id: int):
    """Left-padded (N, S) -> (lens, flat values). Uses the first-non-pad
    POSITION (not value equality) so interior ids equal to pad_id survive."""
    nz = col != pad_id
    any_ = nz.any(axis=1)
    first = np.argmax(nz, axis=1)
    max_len = col.shape[1]
    lens = np.where(any_, max_len - first, 0).astype(np.int64)
    pos = np.arange(max_len)[None, :]
    mask = (pos >= first[:, None]) & any_[:, None]
    return lens, col[mask]


def pack_columns(
    cols: dict[str, np.ndarray], plan: WirePlan, n_rows: int
) -> tuple[np.ndarray, WireLayout]:
    """Pack host columns (each (n_rows,) or (n_rows, S) int) into one uint8
    buffer. Columns shorter than n_rows are zero/pad-row padded (fixed-shape
    final chunk)."""
    seq_data: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    caps: dict[str, int] = {}
    for e in plan.entries:
        if not e.is_seq:
            continue
        col = np.asarray(cols[e.name])
        if len(col) < n_rows:
            pad = np.full(
                (n_rows - len(col), col.shape[1]), e.pad_id, col.dtype
            )
            col = np.concatenate([col, pad])
        lens, values = _seq_structure(col, e.pad_id)
        caps[e.name] = value_capacity(len(values), n_rows, e.max_len)
        seq_data[e.name] = (lens, values)
    layout = compute_layout(plan, n_rows, caps)
    buf = np.zeros(layout.total_bytes, np.uint8)
    by_name = {e.name: e for e in plan.entries}
    for name, part, code, off, count in layout.segments:
        e = by_name[name]
        if part == "len":
            buf[off : off + count] = seq_data[name][0].astype(np.uint8)
            continue
        if e.is_seq:
            values = seq_data[name][1]
            data = np.zeros(count, np.int64)
            data[: len(values)] = values
        else:
            col = np.asarray(cols[name]).ravel()
            data = np.zeros(count, np.int64)
            data[: len(col)] = col
        if part == "hi":
            bits = (data >> 16).astype(np.uint8)
            packed = np.packbits(bits)  # bitorder "big"
            buf[off : off + len(packed)] = packed
        elif code == "u8":
            buf[off : off + count] = data.astype(np.uint8)
        elif code in ("u16", "u16b"):
            lo = (data & 0xFFFF).astype("<u2")
            buf[off : off + 2 * count] = lo.view(np.uint8)
        else:  # i32
            buf[off : off + 4 * count] = data.astype("<i4").view(np.uint8)
    return buf, layout


def build_unpacker(layout: WireLayout):
    """Return a jittable ``unpack(buf) -> {name: int32 array}`` closure that
    reconstructs the dense columns ((N,) scalars, (N, max_len) left-padded
    sequences) from the packed uint8 buffer on device."""
    import jax.numpy as jnp

    by_name = {e.name: e for e in layout.plan.entries}
    segs = layout.segments

    def _decode(buf, code, off, count):
        if code == "u8":
            return buf[off : off + count].astype(jnp.int32)
        if code in ("u16", "u16b"):
            b = buf[off : off + 2 * count].reshape(count, 2).astype(jnp.int32)
            return b[:, 0] | (b[:, 1] << 8)
        b = buf[off : off + 4 * count].reshape(count, 4).astype(jnp.int32)
        return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)

    def _decode_bits(buf, off, count):
        nbytes = (count + 7) // 8
        b = buf[off : off + nbytes].astype(jnp.int32)
        bits = (b[:, None] >> (7 - jnp.arange(8))) & 1  # np.packbits order
        return bits.reshape(-1)[:count]

    def unpack(buf):
        parts: dict[tuple[str, str], object] = {}
        for name, part, code, off, count in segs:
            if part == "hi":
                parts[(name, "hi")] = _decode_bits(buf, off, count)
            else:
                parts[(name, part)] = _decode(buf, code, off, count)
        out = {}
        for e in layout.plan.entries:
            data = parts[(e.name, "data")]
            if e.code == "u16b":
                data = data | (parts[(e.name, "hi")] << 16)
            if not e.is_seq:
                out[e.name] = data
                continue
            lens = parts[(e.name, "len")]
            cap = data.shape[0]
            off_rows = jnp.cumsum(lens) - lens  # exclusive prefix sum
            start = e.max_len - lens
            pos = jnp.arange(e.max_len, dtype=jnp.int32)[None, :]
            src = off_rows[:, None] + pos - start[:, None]
            valid = pos >= start[:, None]
            idx = jnp.clip(src, 0, cap - 1)
            out[e.name] = jnp.where(
                valid, data[idx], jnp.int32(e.pad_id)
            )
        return out

    return unpack
