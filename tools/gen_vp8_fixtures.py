#!/usr/bin/env python3
"""Fixtures + frozen oracle for the `multimodal_dedup_webp_lossy` row.

Lossy VP8 cannot be ENCODED by this repo (decode-only coverage), so
the registered query reads a committed fixture corpus from the jar:
20 smooth-content images encoded at q75 (fixture ids 0..19) and, for
ids 0..9, the SAME RGB content re-encoded at q55 (fixture ids 20..29)
— genuine lossy near-duplicates: requantization moves pixels, so the
planted pairs sit at small-but-nonzero Hamming, unlike the lossless
tiers' closed-form Hamming 0.

The oracle rows are computed HERE, from libwebp's own decoded Y
planes (dHash sampled exactly as Multimodal.dHash64Luma samples) —
i.e. the expected pairs come from the REFERENCE decoder, so the
registered query passes only if the repo's Vp8Codec reconstructs
every fixture byte-identically to libwebp AND the banded pair join
recalls every planted pair. Smooth (blob) content is chosen
deliberately: dHash point-samples pixels, so noise content would put
requantization deltas straight into the comparisons; measured on this
corpus the planted pairs sit at Hamming <= 4 and the nearest
non-planted pair is far above the gate (printed below; regenerate and
re-freeze if the corpus ever changes).

Writes src/main/resources/vp8fixtures/f<i>.webp and prints the VALUES
rows to paste into SparkEntry.oracleSql.
"""
import ctypes
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from gen_vp8_sweep import lib, decode_y, make_img, rng  # noqa: E402


def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def dhash_luma(yb, w, h):
    # mirror of Multimodal.dHash64Luma: 9x8 point-sample grid, bit i
    # set iff right sample > left sample
    lum = [[yb[(y * h // 8) * w + (x * w // 9)] for x in range(9)] for y in range(8)]
    bits = 0
    for i in range(64):
        if lum[i // 8][i % 8 + 1] > lum[i // 8][i % 8]:
            bits |= 1 << i
    return bits


def to_signed(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming(a, b):
    return bin(a ^ b).count("1")


outdir = os.path.join(os.path.dirname(__file__), "..",
                      "src", "main", "resources", "vp8fixtures")
os.makedirs(outdir, exist_ok=True)

def img_grid(w, h, seed):
    """Bilinear upsample of a random 9x8 gray control grid whose
    horizontally-adjacent values always differ by >= 2 steps of 36 —
    every dHash comparison then rides a >= ~60-luma delta, far above
    requantization noise, while each image's SIGN PATTERN is an
    independent random 64-bit draw (no background collisions)."""
    n = rng(seed)
    levels = [40, 76, 112, 148, 184, 220]
    g = [[0] * 9 for _ in range(8)]
    for y in range(8):
        for x in range(9):
            while True:
                v = levels[n() % len(levels)]
                if x == 0 or abs(v - g[y][x - 1]) >= 72:
                    g[y][x] = v
                    break
    # mapping aligned with dHash's sample points: pixel x*w//9 lands
    # (within one pixel) on control column x, so every comparison
    # rides a full control-value delta
    px = bytearray()
    for yy in range(h):
        fy = min(yy * 8 / h, 7.0)
        y0 = int(fy)
        ty = fy - y0
        y1 = min(y0 + 1, 7)
        for xx in range(w):
            fx = min(xx * 9 / w, 8.0)
            x0 = int(fx)
            tx = fx - x0
            x1 = min(x0 + 1, 8)
            v = (g[y0][x0] * (1 - tx) * (1 - ty) + g[y0][x1] * tx * (1 - ty) +
                 g[y1][x0] * (1 - tx) * ty + g[y1][x1] * tx * ty)
            b = int(v)
            px += bytes((b, b, b))
    return bytes(px)


n = rng(0xBEEF)
sizes = [(64, 48), (80, 64), (48, 80), (96, 96), (45, 41)]
hashes = {}
for i in range(20):
    w, h = sizes[i % len(sizes)]
    rgb = img_grid(w, h, 9000 + i * 131)
    for fid, q in ((i, 75), (i + 20, 55)):
        if fid >= 20 and i >= 10:
            continue
        webp = encode(rgb, w, h, q)
        with open(os.path.join(outdir, f"f{fid}.webp"), "wb") as f:
            f.write(webp)
        hashes[fid] = dhash_luma(decode_y(webp, w, h), w, h)

pairs = []
background = []
for a in sorted(hashes):
    for b in sorted(hashes):
        if a >= b:
            continue
        d = hamming(hashes[a], hashes[b])
        if b == a + 20:
            pairs.append((a, b, d))
        else:
            background.append((a, b, d))
planted_max = max(d for _, _, d in pairs)
bg_min = min(d for _, _, d in background)
print(f"planted pairs: {pairs}")
print(f"planted max hamming: {planted_max}, background min: {bg_min}")
assert planted_max <= 4, "requantization moved a planted pair past the gate — lower q delta"
assert bg_min > 4, "background collision — change seeds"

print("\n-- oracle VALUES (paste into SparkEntry) --")
rows = ",\n".join(f"        ({a}::BIGINT, {b}::BIGINT, {d}::BIGINT)"
                  for a, b, d in sorted(pairs))
print(rows)
