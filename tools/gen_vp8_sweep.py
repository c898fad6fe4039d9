#!/usr/bin/env python3
"""Randomized wide sweep for the VP8 luma decoder (not committed as
resources — run together with graft.tools.Vp8GoldenCheck whenever the
decoder changes):

    python3 tools/gen_vp8_sweep.py [n] [outdir]
    sbt "runMain graft.tools.Vp8GoldenCheck target/vp8sweep"

Generates n random-content images across sizes/qualities through the
SIMPLE libwebp API, plus (when the advanced API's ABI matches) a set
of multi-partition / sharp / strong-filter variants through
WebPEncode with explicit WebPConfig — the features the simple API
never exercises. Every case stores the encoder's own decoded Y plane
as ground truth.
"""
import ctypes
import os
import struct
import sys

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


def decode_y(webp, w, h):
    ow, oh = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(ow), ctypes.byref(oh),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y and (ow.value, oh.value) == (w, h)
    s = stride.value
    rows = [ctypes.string_at(ctypes.byref(y.contents, r * s), w) for r in range(h)]
    lib.WebPFree(y)
    return b"".join(rows)


def rng(seed):
    x = seed & 0xffffffff or 1

    def nxt():
        nonlocal x
        x ^= (x << 13) & 0xffffffff
        x ^= x >> 17
        x ^= (x << 5) & 0xffffffff
        return x
    return nxt


def make_img(w, h, seed):
    n = rng(seed)
    kind = n() % 4
    px = bytearray()
    if kind == 0:  # pure noise
        for _ in range(w * h * 3):
            px.append(n() & 0xff)
    elif kind == 1:  # smooth blobs
        cs = [(n() % w, n() % h, 40 + n() % 200) for _ in range(5)]
        for y in range(h):
            for x in range(w):
                v = 0
                for cx, cy, a in cs:
                    d2 = (x - cx) ** 2 + (y - cy) ** 2
                    v += a * 4096 // (4096 + d2 * 8)
                v = min(v, 255)
                px += bytes((v, (v * 3) % 256, 255 - v))
    elif kind == 2:  # tiles + gradient mix
        t = {}
        for y in range(h):
            for x in range(w):
                k = (x // (4 + n() % 1 * 0 + 8), y // 8)
                if k not in t:
                    t[k] = (n() & 0xff, n() & 0xff, n() & 0xff)
                g = (x * 255) // max(w - 1, 1)
                r0, g0, b0 = t[k]
                px += bytes(((r0 + g) // 2, g0, (b0 + 255 - g) // 2))
    else:  # text-like: sparse dark strokes on light bg
        bg = 200 + n() % 55
        img = [[bg] * w for _ in range(h)]
        for _ in range(w * h // 40):
            x, y = n() % w, n() % h
            ln = 1 + n() % 6
            for k in range(ln):
                if x + k < w:
                    img[y][x + k] = n() % 80
        for y in range(h):
            for x in range(w):
                v = img[y][x]
                px += bytes((v, v, v))
    return bytes(px)


# ---- advanced API (WebPConfig/WebPPicture, ABI 0x020f = libwebp 1.5):
# reaches what the simple API never emits — multiple token partitions,
# the simple loop filter, sharpness, autofilter, segment counts ------


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t), ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


ABI = 0x020f


def encode_advanced(rgb, w, h, **kw):
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(kw.pop("quality", 75.0)), ABI)
    for k, v in kw.items():
        setattr(cfg, k, v)
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ABI)
    pic.width, pic.height = w, h
    pic.use_argb = 0
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), bytes(rgb), w * 3)
    wrt = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wrt))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wrt), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"WebPEncode failed: error {pic.error_code}"
    data = ctypes.string_at(wrt.mem, wrt.size)
    lib.WebPMemoryWriterClear(ctypes.byref(wrt))
    return data


# blob image for the committed advanced goldens (gen_vp8_goldens.py)
def img_adv(w, h, seed):
    return make_img(w, h, seed)


ADVANCED = [
    ("parts8", dict(partitions=3)),
    ("parts4", dict(partitions=2)),
    ("parts2_m0", dict(partitions=1, method=0)),
    ("simplefilter", dict(filter_type=0, filter_strength=40, autofilter=0)),
    ("sharp7", dict(filter_sharpness=7, filter_strength=63)),
    ("sharp3_simple", dict(filter_type=0, filter_sharpness=3, filter_strength=50)),
    ("autofilter", dict(autofilter=1)),
    ("seg1", dict(segments=1)),
    ("seg2_snsmax", dict(segments=2, sns_strength=100)),
    ("seg4_snsmax", dict(segments=4, sns_strength=100)),
    ("method6_q90", dict(method=6, quality=90.0)),
    ("method0_q30", dict(method=0, quality=30.0)),
    ("pass10", dict(pass_=10, target_size=2000)),
]


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/vp8sweep"
    os.makedirs(outdir, exist_ok=True)
    n = rng(0xC0FFEE)
    manifest = []
    made = 0
    i = 0
    while made < count:
        i += 1
        w = 1 + n() % 130
        h = 1 + n() % 130
        if n() % 5 == 0:
            w, h = (w | 15) + 1, (h | 15) + 1  # exact MB multiples
        q = [10, 25, 40, 55, 70, 80, 90, 99][n() % 8]
        rgb = make_img(w, h, n())
        out = ctypes.POINTER(ctypes.c_uint8)()
        sz = lib.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(out))
        if sz == 0:
            continue
        webp = ctypes.string_at(out, sz)
        lib.WebPFree(out)
        y = decode_y(webp, w, h)
        name = f"s{i:04d}"
        with open(os.path.join(outdir, name + ".webp"), "wb") as f:
            f.write(webp)
        with open(os.path.join(outdir, name + ".y"), "wb") as f:
            f.write(y)
        manifest.append(f"{name} {w} {h}")
        made += 1
    # advanced-API cases over a few content kinds and sizes
    adv = 0
    for name, kw in ADVANCED:
        for (w, h, seed) in [(96, 80, 11), (64, 48, 22), (33, 17, 33), (176, 144, 44)]:
            rgb = make_img(w, h, seed)
            try:
                webp = encode_advanced(rgb, w, h, **dict(kw))
            except AssertionError as e:
                print(f"advanced {name} {w}x{h}: {e}")
                continue
            y = decode_y(webp, w, h)
            nm = f"adv_{name}_{w}x{h}"
            with open(os.path.join(outdir, nm + ".webp"), "wb") as f:
                f.write(webp)
            with open(os.path.join(outdir, nm + ".y"), "wb") as f:
                f.write(y)
            manifest.append(f"{nm} {w} {h}")
            adv += 1
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(manifest) + "\n")
    print(f"{made} random + {adv} advanced sweep cases in {outdir}")


if __name__ == "__main__":
    main()
