#!/usr/bin/env python3
"""Fixtures + frozen oracle for the `multimodal_dedup_webm` row.

WebM is VP8's native container; the repo decodes VP8 key frames
(Vp8Codec) but cannot ENCODE them, so — exactly like the lossy-WebP
row — the registered query reads a committed fixture corpus whose
frame payloads were produced by the reference libwebp encoder and
muxed here into minimal all-keyframe WebM (EBML header, Segment,
Info, one V_VP8 TrackEntry, one Cluster of SimpleBlocks).

Corpus: 10 base clips (ids 0..9), 65 flat-gray frames each, whose
per-frame gray level walks a random +/-ladder with adjacent steps
>= 36 luma — the tHash (whole-frame luminance-sum delta hash) analogue
of the webp_lossy row's >=2-level dHash grid: requantization noise
(<= ~8 luma on a flat frame's DC) can never flip an adjacent-sum
comparison. Planted twins: ids 10..19 re-encode the SAME frames at
q55 (lossy requant near-dup), ids 20..24 duplicate every frame of
clips 0..4 at q75 (a 2x-fps re-encode — tHash-exact by the floor
identity). 65 frames is tHash's own discrimination floor (see the
Multimodal.tHash64 scaladoc).

The oracle rows are computed HERE from libwebp's own decoded Y planes
(sum + tHash mirrored bit for bit), so the registered query passes
only if the repo's container walk yields exactly the muxed frames AND
Vp8Codec reconstructs each one byte-identically to the reference
decoder. Writes src/main/resources/webmfixtures/c<i>.webm and prints
the VALUES rows for SparkEntry.oracleSql plus the background floor.
"""
import ctypes
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from gen_vp8_sweep import lib, decode_y, rng  # noqa: E402

W, H = 64, 64
NFRAMES = 65


def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def vp8_payload(webp):
    """RIFF walk: the 'VP8 ' chunk payload IS a raw VP8 key frame."""
    assert webp[0:4] == b"RIFF" and webp[8:12] == b"WEBP"
    off = 12
    while off + 8 <= len(webp):
        tag = webp[off:off + 4]
        n = int.from_bytes(webp[off + 4:off + 8], "little")
        if tag == b"VP8 ":
            return webp[off + 8:off + 8 + n]
        off += 8 + n + (n & 1)
    raise AssertionError("no VP8 chunk")


# ---- EBML muxer (write-side only; the repo's WebmCodec is the reader)
def vint(n):
    """EBML data-size VINT (marker bit in the leading byte)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            b = n | (1 << (7 * length))
            return b.to_bytes(length, "big")
    raise AssertionError("size too large")


def el(ident, payload):
    return bytes.fromhex(ident) + vint(len(payload)) + payload


def uint(ident, v):
    n = max(1, (v.bit_length() + 7) // 8)
    return el(ident, v.to_bytes(n, "big"))


def mux_webm(frames, w, h):
    ebml = el("1A45DFA3",
              uint("4286", 1) + uint("42F7", 1) + uint("42F2", 4) +
              uint("42F3", 8) + el("4282", b"webm") +
              uint("4287", 2) + uint("4285", 2))
    info = el("1549A966", uint("2AD7B1", 1000000))
    video = el("E0", uint("B0", w) + uint("BA", h))
    track = el("AE", uint("D7", 1) + uint("73C5", 1) + uint("83", 1) +
               el("86", b"V_VP8") + video)
    tracks = el("1654AE6B", track)
    blocks = b"".join(
        el("A3", b"\x81" + (i % 30000).to_bytes(2, "big") + b"\x80" + f)
        for i, f in enumerate(frames))
    cluster = el("1F43B675", uint("E7", 0) + blocks)
    return ebml + el("18538067", info + tracks + cluster)


def gray_walk(seed):
    """65 gray levels, adjacent steps >= 36 — every tHash comparison
    rides a sum delta >= 36*W*H, far above flat-frame requant noise."""
    n = rng(seed)
    levels = [40, 76, 112, 148, 184, 220]
    g = []
    prev = None
    for _ in range(NFRAMES):
        while True:
            v = levels[n() % len(levels)]
            if prev is None or abs(v - prev) >= 36:
                break
        g.append(v)
        prev = v
    return g


def thash(sums):
    n = len(sums)
    v = [sums[(j * n) // 65] for j in range(65)]
    bits = 0
    for i in range(64):
        if v[i + 1] > v[i]:
            bits |= 1 << i
    return bits


def to_signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def hamming(a, b):
    return bin(a ^ b).count("1")


outdir = os.path.join(os.path.dirname(__file__), "..",
                      "src", "main", "resources", "webmfixtures")
os.makedirs(outdir, exist_ok=True)

base_webps = {}  # cid -> list of q75 webp bytes (for re-encode twins)
sigs = {}
for cid in range(10):
    walk = gray_walk(0xA5E + cid * 7919)
    webps = [encode(bytes([g]) * (W * H * 3), W, H, 75) for g in walk]
    base_webps[cid] = (walk, webps)
    variants = [(cid, webps)]
    # q55 requant twin
    walk_q55 = [encode(bytes([g]) * (W * H * 3), W, H, 55) for g in walk]
    variants.append((cid + 10, walk_q55))
    # 2x-fps duplication twin for clips 0..4
    if cid < 5:
        dup = [wp for wp in webps for _ in range(2)]
        variants.append((cid + 20, dup))
    for fid, clip_webps in variants:
        frames = [vp8_payload(wp) for wp in clip_webps]
        with open(os.path.join(outdir, f"c{fid}.webm"), "wb") as f:
            f.write(mux_webm(frames, W, H))
        sums = [sum(decode_y(wp, W, H)) for wp in clip_webps]
        sigs[fid] = thash(sums)

pairs = []
ids = sorted(sigs)
floor = 64
for i in range(len(ids)):
    for j in range(i + 1, len(ids)):
        hd = hamming(sigs[ids[i]], sigs[ids[j]])
        if hd <= 4:
            pairs.append((ids[i], ids[j], hd))
        else:
            floor = min(floor, hd)

expected = sorted({(min(a, b), max(a, b)) for a in range(10)
                   for b in [a + 10]} |
                  {(a, a + 20) for a in range(5)} |
                  {(a + 10, a + 20) for a in range(5)})
got = sorted((a, b) for a, b, _ in pairs)
print(f"# fixtures: {len(sigs)} clips, planted pairs found: {got}")
print(f"# expected planted set: {expected}")
print(f"# background floor (nearest non-planted): {floor}")
assert got == expected, "planted pairs must be exactly the expected set"

total = sum(os.path.getsize(os.path.join(outdir, f))
            for f in os.listdir(outdir))
print(f"# committed bytes: {total}")
print("-- VALUES rows for SparkEntry.oracleSql (d1, d2, hamming):")
rows = ",\n".join(f"  ({a}, {b}, {h})" for a, b, h in sorted(pairs))
print(rows)
