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


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []

    # 7x5 gradient: odd width -> 3-byte row padding exercised.
    def grad(x, y):
        return ((x * 13 + 5) % 256, (y * 29 + 11) % 256, ((x + y) * 7 + 3) % 256)

    # 4x4 two-tone: top half differs from bottom half, so first_unit
    # (the decoded TOP-LEFT pixel) breaks if row order is flipped.
    def tone(x, y):
        return (200, 40, 90) if y < 2 else (10, 250, 30)

    for name, w, h, px in [("img_gradient", 7, 5, grad), ("img_twotone", 4, 4, tone)]:
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

    # Mono ramp: sample i = ((i * 37) % 2048) - 1024.
    mono = [((i * 37) % 2048) - 1024 for i in range(1000)]
    # Stereo: L = ((i * 11) % 512) - 256, R = ((i * 17) % 512) - 256, interleaved.
    stereo = []
    for i in range(500):
        stereo += [((i * 11) % 512) - 256, ((i * 17) % 512) - 256]

    for name, rate, ch, samples in [
        ("audio_ramp", 8000, 1, mono), ("audio_stereo", 16000, 2, stereo),
    ]:
        payload = wav_bytes(rate, ch, samples)
        with open(os.path.join(OUT, name + ".wav"), "wb") as f:
            f.write(payload)
        rows.append({
            "name": name + ".wav", "kind": "audio", "width": 0, "height": 0,
            "sample_rate": rate, "n_units": len(samples),
            "value_sum": sum(samples), "first_unit": samples[0],
        })

    cols = ["name", "kind", "width", "height", "sample_rate",
            "n_units", "value_sum", "first_unit"]
    with open(os.path.join(OUT, "expected.csv"), "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=cols)
        wr.writeheader()
        for row in sorted(rows, key=lambda r: r["name"]):
            wr.writerow(row)
    print("wrote %d fixtures + expected.csv to %s" % (len(rows), OUT))


if __name__ == "__main__":
    main()
