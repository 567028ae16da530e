#!/usr/bin/env python3
"""Generate the real-codec media fixtures under fixtures/media/.

Writes genuine BMP (24-bit uncompressed, BITMAPINFOHEADER) and WAV
(RIFF, 16-bit PCM) files from deterministic integer formulas, plus
expected.csv with the aggregates an independent decoder must produce.
This script is the ORACLE side of q57_multimodal_decode: the Scala
decoders in multimodal/Multimodal.scala never see this code, so a
hash match means the JVM decode of the container formats is correct
(row padding, bottom-up row order, channel order, chunk walking,
little-endian PCM).

Pixel/sample formulas are pure integer arithmetic — regenerating on
any platform yields byte-identical files.
"""
import csv
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media")


def bmp_bytes(width, height, pixel):
    """24-bit bottom-up BMP. pixel(x, y) -> (r, g, b) with y=0 the TOP row."""
    row_stride = (width * 3 + 3) // 4 * 4
    data_size = row_stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel(x, y)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (row_stride - len(row))
        rows.append(bytes(row))
    return header + b"".join(rows)


def wav_bytes(sample_rate, channels, samples):
    """RIFF/WAVE, PCM 16-bit LE. samples = flat interleaved int16 list."""
    data = struct.pack("<%dh" % len(samples), *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def ahash(w, h, px):
    """64-bit average-hash from the drawing formula (independent of the
    Scala decoder+hasher): luma = r+g+b, 8x8 blocks with floor ranges
    [floor(i*h/8), floor((i+1)*h/8)), bit_k (k = by*8+bx, MSB first) set
    iff blockSum * totalPixels > totalSum * blockCount (exact integer
    cross-multiplication -- no fractional averages anywhere). Returned
    SIGNED 64-bit, matching a Scala Long."""
    luma = [[sum(px(x, y)) for x in range(w)] for y in range(h)]
    total = sum(sum(r) for r in luma)
    n = w * h
    hv = 0
    for by in range(8):
        for bx in range(8):
            ys = range(by * h // 8, (by + 1) * h // 8)
            xs = range(bx * w // 8, (bx + 1) * w // 8)
            bs = sum(luma[y][x] for y in ys for x in xs)
            bc = len(ys) * len(xs)
            bit = 1 if bs * n > total * bc else 0
            hv |= bit << (63 - (by * 8 + bx))
    return hv - (1 << 64) if hv >= (1 << 63) else hv


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    prows = []
    arows = []

    # 7x5 gradient: odd width -> 3-byte row padding exercised.
    def grad(x, y):
        return ((x * 13 + 5) % 256, (y * 29 + 11) % 256, ((x + y) * 7 + 3) % 256)

    # 4x4 two-tone: top half differs from bottom half, so first_unit
    # (the decoded TOP-LEFT pixel) breaks if row order is flipped.
    def tone(x, y):
        return (200, 40, 90) if y < 2 else (10, 250, 30)

    # 16x16 family for the perceptual-hash queries: a base gradient, a
    # near-duplicate (3 pixels retinted -- small hamming), an inverted
    # copy (hamming ~ 64), and an unrelated checker.
    def grad16(x, y):
        return ((x * 16 + 7) % 256, (y * 16 + 3) % 256, ((x * y) * 5 + 9) % 256)

    def grad16_tweak(x, y):
        if (x, y) in ((3, 3), (12, 4), (8, 15)):
            return (255, 255, 255)
        return grad16(x, y)

    def grad16_inv(x, y):
        r, g, b = grad16(x, y)
        return (255 - r, 255 - g, 255 - b)

    def checker16(x, y):
        return (250, 250, 250) if (x // 2 + y // 2) % 2 == 0 else (5, 5, 5)

    images = [
        ("img_gradient", 7, 5, grad), ("img_twotone", 4, 4, tone),
        ("img_g16", 16, 16, grad16), ("img_g16_tweak", 16, 16, grad16_tweak),
        ("img_g16_inv", 16, 16, grad16_inv), ("img_checker16", 16, 16, checker16),
    ]
    for name, w, h, px in images:
        payload = bmp_bytes(w, h, px)
        with open(os.path.join(OUT, name + ".bmp"), "wb") as f:
            f.write(payload)
        vals = [px(x, y) for y in range(h) for x in range(w)]
        r0, g0, b0 = px(0, 0)
        rows.append({
            "name": name + ".bmp", "kind": "image", "width": w, "height": h,
            "sample_rate": 0, "n_units": w * h,
            "value_sum": sum(r + g + b for r, g, b in vals),
            "first_unit": (r0 << 16) | (g0 << 8) | b0,
        })
        prows.append({"name": name + ".bmp", "ahash": ahash(w, h, px)})

    def audio_hash(samples):
        """64-bit energy hash from the sample formulas (independent of
        the JVM decode+hash): 64 floor-range windows over the
        interleaved stream, bit set iff windowAbsSum * n > totalAbsSum
        * windowCount. Signed 64-bit like a Scala Long."""
        n = len(samples)
        total = sum(abs(s) for s in samples)
        hv = 0
        for k in range(64):
            lo, hi = k * n // 64, (k + 1) * n // 64
            ws = sum(abs(s) for s in samples[lo:hi])
            if ws * n > total * (hi - lo):
                hv |= 1 << (63 - k)
        return hv - (1 << 64) if hv >= (1 << 63) else hv

    # Mono ramp: sample i = ((i * 37) % 2048) - 1024.
    mono = [((i * 37) % 2048) - 1024 for i in range(1000)]
    # Near-duplicate of the ramp: two ~30-sample runs silenced (about
    # two of the 64 energy windows) -- small but nonzero hamming.
    mono_tweak = list(mono)
    for i in list(range(100, 130)) + list(range(700, 730)):
        mono_tweak[i] = 0
    # Loud/quiet alternating blocks: far from the ramp's envelope.
    blocks = [(3000 if (i // 125) % 2 == 0 else 50) for i in range(1000)]
    # Stereo: L = ((i * 11) % 512) - 256, R = ((i * 17) % 512) - 256, interleaved.
    stereo = []
    for i in range(500):
        stereo += [((i * 11) % 512) - 256, ((i * 17) % 512) - 256]

    for name, rate, ch, samples in [
        ("audio_ramp", 8000, 1, mono), ("audio_stereo", 16000, 2, stereo),
        ("audio_ramp_tweak", 8000, 1, mono_tweak),
        ("audio_blocks", 8000, 1, blocks),
    ]:
        payload = wav_bytes(rate, ch, samples)
        with open(os.path.join(OUT, name + ".wav"), "wb") as f:
            f.write(payload)
        rows.append({
            "name": name + ".wav", "kind": "audio", "width": 0, "height": 0,
            "sample_rate": rate, "n_units": len(samples),
            "value_sum": sum(samples), "first_unit": samples[0],
        })
        arows.append({"name": name + ".wav", "ahash": audio_hash(samples)})

    cols = ["name", "kind", "width", "height", "sample_rate",
            "n_units", "value_sum", "first_unit"]
    with open(os.path.join(OUT, "expected.csv"), "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=cols)
        wr.writeheader()
        for row in sorted(rows, key=lambda r: r["name"]):
            wr.writerow(row)
    with open(os.path.join(OUT, "expected_phash.csv"), "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=["name", "ahash"])
        wr.writeheader()
        for row in sorted(prows, key=lambda r: r["name"]):
            wr.writerow(row)
    with open(os.path.join(OUT, "expected_audiohash.csv"), "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=["name", "ahash"])
        wr.writeheader()
        for row in sorted(arows, key=lambda r: r["name"]):
            wr.writerow(row)
    print("wrote %d fixtures + expected/phash/audiohash CSVs to %s"
          % (len(rows), OUT))


if __name__ == "__main__":
    main()
