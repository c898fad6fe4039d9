#!/usr/bin/env python3
"""Transcribe the VP8 (RFC 6386) constant tables into Scala source.

The tables themselves are published in RFC 6386 ("VP8 Data Format and
Decoding Guide") sections 11, 13 and 14 — the default coefficient
probabilities (13.5), the coefficient-update probabilities (13.4), the
keyframe 4x4 intra-mode probabilities (11.5), and the dequantization
lookups (14.1). Hand-typing ~3.3 KB of numbers invites tail-position
transcription errors (the exact bug class the round-14 VP8L work
documented), so this script reads them out of the host's libwebp
binary instead: each table is located by a short distinctive prefix,
cross-checked against the second copy the library carries
(decoder + encoder link the same constants), range-checked, and
emitted as `graft/operators/Vp8Tables.scala`.

Layout note, discovered from the binary and encoded in the output:
libwebp stores the default coefficient table COMPACTED to 31
band-blocks (1023 bytes) — block type 0 (luma-with-Y2, whose token
scan starts at coefficient 1) omits its unreachable band-0 block.
The bitstream's update loop, however, covers the full
4 x 8 x 3 x 11 lattice (the update-probability table in the same
binary is 1056 bytes), so the Scala output re-expands the defaults to
the full RFC shape with the unreachable block as 128-filler.

Run: python3 tools/extract_vp8_tables.py > src/main/scala/graft/operators/Vp8Tables.scala
"""
import struct
import sys

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
data = open(SO, "rb").read()


def find_all(b):
    out, i = [], data.find(b)
    while i >= 0:
        out.append(i)
        i = data.find(b, i + 1)
    return out


def locate(head, length, name, expect_copies=2):
    hits = find_all(bytes(head))
    assert hits, f"{name}: prefix not found"
    tables = {data[h:h + length] for h in hits}
    # every full-length hit must agree (decoder and encoder copies)
    full = [data[h:h + length] for h in hits]
    assert all(t == full[0] for t in full[:expect_copies]), \
        f"{name}: copies disagree"
    return full[0]


# --- default coefficient probs: compact 31-block form ----------------
coeff_compact = locate([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
                        189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
                       1023, "coeff probs")
assert all(1 <= b <= 255 for b in coeff_compact)
# re-expand: type 0 gets a 128-filled band 0 (unreachable: its token
# scan starts at coefficient 1, and band 0 holds only coefficient 0)
blocks = [coeff_compact[i:i + 33] for i in range(0, 1023, 33)]
expanded = [bytes([128] * 33)] + blocks[:7] + blocks[7:]
coeff = b"".join(expanded)
assert len(coeff) == 1056

# --- coefficient update probs: full 1056 ------------------------------
upd_hits = [i for i in range(len(data) - 1056)
            if data[i] >= 150 and (i == 0 or data[i - 1] < 150)]
upd = None
for h in upd_hits:
    t = data[h:h + 1056]
    if all(b >= 150 for b in t):
        upd = t
        break
assert upd is not None and min(upd) >= 150, "update probs not found"

# --- keyframe 4x4 (B_PRED) mode probs [10][10][9] ---------------------
bmode = locate([231, 120, 48, 89, 115, 113, 120, 152, 112], 900, "kf bmode")
assert all(1 <= b <= 255 for b in bmode)

# --- dequant lookups ---------------------------------------------------
dc_i = find_all(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12]))[0]
dcq = data[dc_i:dc_i + 128]
assert dcq[-1] == 157 and all(dcq[i] <= dcq[i + 1] for i in range(127))
ac_i = find_all(struct.pack("<12H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15))[0]
acq = struct.unpack("<128H", data[ac_i:ac_i + 256])
assert acq[-1] == 284 and all(acq[i] <= acq[i + 1] for i in range(127))


def scala_bytes(name, b, per_line=16):
    lines = []
    for i in range(0, len(b), per_line):
        lines.append(", ".join(str(x) for x in b[i:i + per_line]))
    body = ",\n    ".join(lines)
    return f"  val {name}: Array[Int] = Array(\n    {body})\n"


print("""package graft.operators

/** VP8 (RFC 6386) constant tables, transcribed from the public spec
  * via tools/extract_vp8_tables.py (see its header for the provenance
  * and the compact-vs-full layout note). DO NOT EDIT BY HAND — the
  * generator range-checks and cross-checks two independent copies.
  *
  *  - [[coeffProbs]]: default token probabilities, RFC 6386 §13.5,
  *    flattened [4 types][8 bands][3 contexts][11 probs] (type 0
  *    band 0 is unreachable filler — its scan starts at coeff 1).
  *  - [[coeffUpdateProbs]]: update-flag probabilities, §13.4, same
  *    flattening (the bitstream transmits the FULL lattice).
  *  - [[kfBModeProbs]]: keyframe 4x4 intra-mode probabilities,
  *    §11.5, flattened [10 above][10 left][9 probs].
  *  - [[dcQLookup]]/[[acQLookup]]: dequantization, §14.1.
  */
private[operators] object Vp8Tables {""")
print(scala_bytes("coeffProbs", coeff))
print(scala_bytes("coeffUpdateProbs", upd))
print(scala_bytes("kfBModeProbs", bmode))
print(scala_bytes("dcQLookup", dcq))
print(scala_bytes("acQLookup", list(acq)))
print("}")
