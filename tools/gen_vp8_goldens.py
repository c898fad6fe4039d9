#!/usr/bin/env python3
"""Generate LOSSY WebP (VP8 key-frame) decoder goldens via libwebp.

Round-14 established the golden discipline for VP8L with an ad-hoc
ctypes script; this is the committed equivalent for lossy VP8. Each
golden is a deterministic synthetic image encoded by the REFERENCE
libwebp encoder (simple API — default config: 4 segments, loop filter
strength 60, one token partition) and decoded back by the REFERENCE
decoder's WebPDecodeYUV, whose Y plane is the ground truth: VP8
reconstruction is bit-exact by spec construction, so our decoder's
luma output must match byte-for-byte.

Outputs <name>.webp + <name>.y (raw w*h luma, row-major) +
manifest_lossy.txt rows "<name> <w> <h>" under
src/test/resources/webp/.

Run: python3 tools/gen_vp8_goldens.py
"""
import ctypes
import os
import struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def encode_lossy(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0, "encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_y(webp, w, h):
    ow, oh = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(ow), ctypes.byref(oh),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "decode failed"
    assert (ow.value, oh.value) == (w, h), (ow.value, oh.value, w, h)
    s = stride.value
    rows = [ctypes.string_at(ctypes.byref(y.contents, r * s), w)
            for r in range(h)]
    lib.WebPFree(y)
    return b"".join(rows)


# deterministic xorshift so the corpus never depends on library RNGs
def rng(seed):
    x = seed & 0xffffffff or 1

    def nxt():
        nonlocal x
        x ^= (x << 13) & 0xffffffff
        x ^= x >> 17
        x ^= (x << 5) & 0xffffffff
        return x
    return nxt


def img_flat(w, h, r, g, b):
    return bytes([r, g, b] * (w * h))


def img_gradient_h(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 255) // max(w - 1, 1)
            px += bytes((v, v // 2, 255 - v))
    return bytes(px)


def img_gradient_v(w, h):
    px = bytearray()
    for y in range(h):
        v = (y * 255) // max(h - 1, 1)
        px += bytes((v, 255 - v, v)) * w
    return bytes(px)


def img_noise(w, h, seed):
    n = rng(seed)
    return bytes(n() & 0xff for _ in range(w * h * 3))


def img_blobs(w, h, seed):
    # smooth low-frequency field: sums of shifted parabolas — photo-ish
    # content that exercises B_PRED sub-modes and mid-size coefficients
    n = rng(seed)
    cs = [(n() % w, n() % h, 40 + n() % 200) for _ in range(6)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = 0
            for cx, cy, a in cs:
                d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
                v += a * 4096 // (4096 + d2 * 8)
            v = min(v, 255)
            px += bytes((v, (v * 2) % 256, 255 - v))
    return bytes(px)


def img_blocks(w, h, seed):
    # hard 8x8 tiles: strong edges drive the loop filter and HEV paths
    n = rng(seed)
    tiles = {}
    px = bytearray()
    for y in range(h):
        for x in range(w):
            k = (x // 8, y // 8)
            if k not in tiles:
                tiles[k] = (n() & 0xff, n() & 0xff, n() & 0xff)
            px += bytes(tiles[k])
    return bytes(px)


CASES = [
    ("vp8_flat", img_flat(64, 48, 90, 140, 200), 64, 48, 75),
    ("vp8_gradh", img_gradient_h(64, 64), 64, 64, 75),
    ("vp8_gradv", img_gradient_v(48, 80), 48, 80, 75),
    ("vp8_noise", img_noise(64, 48, 7), 64, 48, 75),
    ("vp8_noise_q20", img_noise(64, 48, 7), 64, 48, 20),
    ("vp8_noise_q95", img_noise(64, 48, 7), 64, 48, 95),
    ("vp8_blobs", img_blobs(96, 80, 21), 96, 80, 75),
    ("vp8_blobs_q40", img_blobs(96, 80, 21), 96, 80, 40),
    ("vp8_blocks", img_blocks(64, 64, 33), 64, 64, 75),
    ("vp8_odd", img_blobs(33, 17, 5), 33, 17, 75),
    ("vp8_tiny", img_flat(1, 1, 200, 10, 60), 1, 1, 75),
    ("vp8_thin", img_gradient_h(66, 3), 66, 3, 75),
    ("vp8_tall", img_gradient_v(3, 66), 3, 66, 75),
    ("vp8_mb", img_blobs(16, 16, 9), 16, 16, 75),
    ("vp8_big", img_blobs(176, 144, 55), 176, 144, 60),
]

outdir = os.path.join(os.path.dirname(__file__), "..",
                      "src", "test", "resources", "webp")

# advanced-API cases (encoder knobs the simple API never sets): token
# partitions > 1, the SIMPLE loop filter, max sharpness — pinned as
# committed goldens so those decode paths never regress silently
import sys
sys.path.insert(0, os.path.dirname(__file__))
from gen_vp8_sweep import encode_advanced, img_adv  # noqa: E402

ADV_CASES = [
    ("vp8_parts8", img_adv(96, 80, 11), 96, 80, dict(partitions=3)),
    ("vp8_simplefilter", img_adv(64, 48, 22), 64, 48,
     dict(filter_type=0, filter_strength=40, autofilter=0)),
    ("vp8_sharp7", img_adv(64, 64, 33), 64, 64,
     dict(filter_sharpness=7, filter_strength=63)),
]

manifest = []
for name, rgb, w, h, kw in ADV_CASES:
    webp = encode_advanced(rgb, w, h, **kw)
    y = decode_y(webp, w, h)
    with open(os.path.join(outdir, name + ".webp"), "wb") as f:
        f.write(webp)
    with open(os.path.join(outdir, name + ".y"), "wb") as f:
        f.write(y)
    manifest.append(f"{name} {w} {h}")
    print(f"{name}: {w}x{h} adv webp={len(webp)}B")

for name, rgb, w, h, q in CASES:
    webp = encode_lossy(rgb, w, h, q)
    y = decode_y(webp, w, h)
    with open(os.path.join(outdir, name + ".webp"), "wb") as f:
        f.write(webp)
    with open(os.path.join(outdir, name + ".y"), "wb") as f:
        f.write(y)
    manifest.append(f"{name} {w} {h}")
    print(f"{name}: {w}x{h} q={q} webp={len(webp)}B")
with open(os.path.join(outdir, "manifest_lossy.txt"), "w") as f:
    f.write("\n".join(manifest) + "\n")
print(f"{len(CASES)} lossy goldens written")
