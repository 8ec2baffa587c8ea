"""Baseline JPEG (ITU-T T.81, JFIF container) — a REAL lossy codec,
stdlib + numpy only: forward/inverse 8x8 DCT, quantization, zigzag,
DC-differential + run-length Huffman entropy coding with the Annex K
luminance tables, 0xFF byte stuffing, and the full marker stream
(SOI/APP0/DQT/SOF0/DHT/SOS/EOI). Grayscale (one component); color,
subsampling, progressive scans, and restart intervals raise
``NotImplementedError`` explicitly.

Lossiness vs an exact oracle: quantization rounds DCT coefficients, so
a general round trip is approximate (tests pin PSNR bounds). But a
block whose 64 samples are all EQUAL has every AC coefficient
mathematically zero and a DC of exactly 8x(v-128) — with an all-ones
quantization table the round trip is EXACT (float error ~1e-13 rounds
away). ``mm_jpeg_decode_stats`` exploits that: each payload byte
becomes one constant 8x8 block, so the DECODED pixels equal the input
bytes expanded 64x, and DuckDB replays the expansion in the byte
domain without needing a DCT. The codec itself stays fully general —
the encoder is the same code path either way, and the standard-table
PSNR tests cover non-constant content.

Reference parity note: the Go reference has no media tier at all
(SURVEY.md §2 — word-count MapReduce over text files); this module is
part of the multimodal extension surface the north star asks for.

Scale (100 TB of images): encode/decode run per-row inside Arrow
``mapInPandas`` batches — zero shuffles, embarrassingly parallel; the
DCT is vectorized across all blocks of an image with one einsum, so
Python cost is the entropy loop only (a few symbols per block).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

# Annex K.1 luminance quantization table, natural (row-major) order.
STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# Zigzag scan: position k in the scan reads natural index ZIGZAG[k].
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 luminance Huffman specs: (BITS counts for lengths 1..16,
# symbol values in canonical order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) under JPEG's canonical assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct_matrix():
    import numpy as np

    c = np.ones(8)
    c[0] = 1.0 / np.sqrt(2.0)
    x = np.arange(8)
    m = 0.5 * c[:, None] * np.cos((2 * x[None, :] + 1)
                                  * np.arange(8)[:, None] * np.pi / 16.0)
    return m


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


_LUT_CACHE: dict[bytes, tuple[list, list]] = {}


def _lut_cached(key: bytes, dec: dict) -> tuple[list, list]:
    """65536-entry peek16 -> (symbol, code length) decode tables,
    memoized on the DHT body bytes — batch decoding re-sees the same
    (usually Annex K) tables for every image, and the two ~65k-entry
    list builds would otherwise dominate small-image decode time."""
    got = _LUT_CACHE.get(key)
    if got is None:
        import numpy as np

        sym = np.full(65536, -1, dtype=np.int16)
        lns = np.zeros(65536, dtype=np.uint8)
        for (ln, code), s in dec.items():
            lo = code << (16 - ln)
            sym[lo : lo + (1 << (16 - ln))] = s
            lns[lo : lo + (1 << (16 - ln))] = ln
        if len(_LUT_CACHE) >= 64:  # bound: corrupt streams could vary
            _LUT_CACHE.clear()
        _LUT_CACHE[key] = got = (sym.tolist(), lns.tolist())
    return got


def _size_of(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a `size`-bit amplitude to its signed
    coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def encode_jpeg(pixels, quant=None) -> bytes:
    """Baseline JFIF bytes for an (H, W) uint8 grayscale array.
    `quant` is a 64-entry natural-order quantization table (default:
    Annex K.1 luminance). Edge-replicated padding to 8x8 multiples;
    SOF0 carries the true dimensions."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise NotImplementedError("encode_jpeg: 8-bit grayscale only")
    h, w = px.shape
    q = np.asarray(
        STD_LUMA_QUANT if quant is None else quant, dtype=np.int64
    ).reshape(64)
    if q.min() < 1 or q.max() > 255:
        raise ValueError("quantization entries must be in 1..255")
    hb, wb = -(-h // 8), -(-w // 8)
    padded = np.empty((hb * 8, wb * 8), dtype=np.uint8)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    # (nblocks, 8, 8) raster order, level-shifted
    blocks = (
        padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    C = _dct_matrix()
    # C @ B @ C.T per block; broadcast matmul beats einsum ~5x here
    coef = (C @ blocks) @ C.T
    quantized = (np.sign(coef) * np.floor(np.abs(coef) / q.reshape(8, 8)
                                          + 0.5)).astype(np.int64)
    zz = quantized.reshape(-1, 64)[:, ZIGZAG]  # (nblocks, 64) zigzag

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    # hot path: visit only nonzero AC coefficients (a 64-entry Python
    # scan per block is ~30x the work on smooth/constant content)
    dcs = zz[:, 0].tolist()
    has_ac = (zz[:, 1:] != 0).any(axis=1).tolist()
    for b, dc in enumerate(dcs):
        diff = dc - prev_dc
        prev_dc = dc
        s = _size_of(diff)
        if s > 11:
            raise ValueError("DC difference beyond category 11")
        code, length = dc_codes[s]
        bw.write(code, length)
        if s:
            amp = diff if diff >= 0 else diff + (1 << s) - 1
            bw.write(amp, s)
        prev_k = 0
        if has_ac[b]:
            row = zz[b]
            for k in (np.flatnonzero(row[1:]) + 1).tolist():
                run = k - prev_k - 1
                prev_k = k
                while run >= 16:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                v = int(row[k])
                s = _size_of(v)
                if s > 10:
                    raise ValueError(
                        "AC coefficient beyond the baseline table's size "
                        "10 (quantization table too fine for this content)"
                    )
                code, length = ac_codes[(run << 4) | s]
                bw.write(code, length)
                amp = v if v >= 0 else v + (1 << s) - 1
                bw.write(amp, s)
        if prev_k != 63:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    return b"".join(
        [
            b"\xff\xd8",  # SOI
            seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xDB, bytes([0x00]) + bytes(int(q[i]) for i in ZIGZAG)),
            seg(
                0xC0,
                bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([1, 0x01, 0x11, 0x00]),
            ),
            seg(0xC4, bytes([0x00] + DC_BITS + DC_VALS)),
            seg(0xC4, bytes([0x10] + AC_BITS + AC_VALS)),
            seg(0xDA, bytes([1, 0x01, 0x00, 0, 63, 0])),
            entropy,
            b"\xff\xd9",  # EOI
        ]
    )


def decode_jpeg(payload: bytes) -> dict:
    """Parse baseline JFIF back to pixels: marker walk, DQT/DHT table
    loads, SOF0 header, Huffman + DC-differential + run-length entropy
    decode, dequantize, IDCT, level shift, clamp, crop to the SOF
    dimensions. Raises ValueError on corruption and
    NotImplementedError for progressive/color/subsampled streams."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    sos = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        length = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if pos + 2 + length > len(payload):
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        body = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                if off + 65 > len(body):
                    raise ValueError("truncated DQT table body")
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                )
                quant[tq] = t
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                if off + 17 + n > len(body):
                    raise ValueError(
                        "truncated DHT table body (BITS counts exceed "
                        "the segment)"
                    )
                vals = list(body[off + 17 : off + 17 + n])
                # decode table: (length, code) -> symbol
                dec, code, k = {}, 0, 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        dec[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = (body[off + 1 : off + 17 + n], dec)
                off += 17 + n
        elif marker == 0xC0:
            depth = body[0]
            hh = int.from_bytes(body[1:3], "big")
            ww = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if depth != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            if ncomp != 1:
                raise NotImplementedError("only single-component (gray)")
            if body[7] != 0x11:
                raise NotImplementedError("subsampling not supported")
            sof = (hh, ww, body[8])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF 0xFF{marker:02X} not supported"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before SOF0")
            if body[0] != 1:
                raise NotImplementedError("only single-component scans")
            sos = (body[2] >> 4, body[2] & 0x0F)
            break
        # APPn / COM / others: skipped
    if sof is None or sos is None:
        raise ValueError("missing SOF0/SOS segment")
    hh, ww, tq = sof
    if tq not in quant:
        raise ValueError(f"SOF references undefined quant table {tq}")
    dc_dec = huff.get((0, sos[0]))
    ac_dec = huff.get((1, sos[1]))
    if dc_dec is None or ac_dec is None:
        raise ValueError("SOS references undefined Huffman tables")

    # ---- entropy segment: locate, unstuff, and LUT-decode ----
    # The per-bit reader this replaces cost ~25 Python calls per block;
    # the windowed 16-bit peek + canonical-code LUT does one array
    # lookup per Huffman symbol and one shift per amplitude.
    arr = np.frombuffer(payload, dtype=np.uint8)
    ffs = pos + np.flatnonzero(arr[pos:-1] == 0xFF)
    terms = ffs[arr[ffs + 1] != 0x00]
    if len(terms) == 0:
        raise ValueError("entropy stream truncated (no trailing marker)")
    end = int(terms[0])  # offset of the first real marker: stream end
    seg = arr[pos:end]
    stuffed = np.flatnonzero(seg == 0xFF) + 1  # the 0x00 after each 0xFF
    clean = (np.delete(seg, stuffed) if len(stuffed) else seg).tobytes()
    data = clean + b"\x00\x00\x00\x00"
    nbits = 8 * len(clean)

    dc_sym, dc_len = _lut_cached(*dc_dec)
    ac_sym, ac_len = _lut_cached(*ac_dec)

    hb, wb = -(-hh // 8), -(-ww // 8)
    nblocks = hb * wb
    zz = np.zeros((nblocks, 64), dtype=np.int64)
    prev_dc = 0
    bitpos = 0
    for b in range(nblocks):
        if bitpos >= nbits:
            raise ValueError("entropy stream truncated")
        bi, bo = bitpos >> 3, bitpos & 7
        w = (
            (data[bi] << 24) | (data[bi + 1] << 16)
            | (data[bi + 2] << 8) | data[bi + 3]
        ) >> (16 - bo) & 0xFFFF
        s = dc_sym[w]
        if s < 0:
            raise ValueError("invalid Huffman code in entropy stream")
        bitpos += dc_len[w]
        if s:
            bi, bo = bitpos >> 3, bitpos & 7
            v = (
                (data[bi] << 24) | (data[bi + 1] << 16)
                | (data[bi + 2] << 8) | data[bi + 3]
            ) >> (32 - bo - s) & ((1 << s) - 1)
            bitpos += s
            if bitpos > nbits:
                raise ValueError("entropy stream truncated")
            prev_dc += _extend(v, s)
        zz[b, 0] = prev_dc
        k = 1
        while k < 64:
            if bitpos >= nbits:
                raise ValueError("entropy stream truncated")
            bi, bo = bitpos >> 3, bitpos & 7
            w = (
                (data[bi] << 24) | (data[bi + 1] << 16)
                | (data[bi + 2] << 8) | data[bi + 3]
            ) >> (16 - bo) & 0xFFFF
            rs = ac_sym[w]
            if rs < 0:
                raise ValueError("invalid Huffman code in entropy stream")
            bitpos += ac_len[w]
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past the end of the block")
            bi, bo = bitpos >> 3, bitpos & 7
            v = (
                (data[bi] << 24) | (data[bi + 1] << 16)
                | (data[bi + 2] << 8) | data[bi + 3]
            ) >> (32 - bo - s) & ((1 << s) - 1)
            bitpos += s
            if bitpos > nbits:
                raise ValueError("entropy stream truncated")
            zz[b, k] = _extend(v, s)
            k += 1
    if nbits - bitpos >= 8:
        raise ValueError("missing EOI after entropy stream")
    if payload[end : end + 2] != b"\xff\xd9":
        raise ValueError(
            "marker inside entropy stream (restart intervals are not "
            "supported)"
        )

    coef = np.zeros((nblocks, 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz * quant[tq][ZIGZAG]
    C = _dct_matrix()
    # C.T @ K @ C per block (inverse of the encoder's C @ B @ C.T)
    spatial = (C.T @ coef.reshape(-1, 8, 8)) @ C + 128.0
    px = np.clip(np.floor(spatial + 0.5), 0, 255).astype(np.uint8)
    full = (
        px.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3)
        .reshape(hb * 8, wb * 8)
    )
    return {
        "width": ww,
        "height": hh,
        "pixels": full[:hh, :ww],
        "quant_table": quant[tq].copy(),
    }


JPEG_BLOCKS_W = 8  # constant-block images are 8 blocks (64 px) wide


@register(
    "mm_jpeg_decode_stats",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 1
    ),
    b AS (
      SELECT doc_id, hx, n,
             greatest(1, CAST(ceil(n / {JPEG_BLOCKS_W}.0) AS BIGINT)) AS hb
      FROM raw
    ),
    px AS (
      SELECT doc_id, n, hb,
             coalesce(list_sum(list_transform(range(0, n),
               i -> CAST('0x' || substr(hx, CAST(i * 2 + 1 AS INTEGER), 2)
                         AS INTEGER))), 0) * 64 AS s,
             list_aggregate(list_transform(range(0, hb), r ->
               repeat(list_aggregate(list_transform(
                 range(0, {JPEG_BLOCKS_W}), c ->
                   repeat(CASE
                     WHEN r * {JPEG_BLOCKS_W} + c < n THEN substr(hx,
                       CAST((r * {JPEG_BLOCKS_W} + c) * 2 + 1 AS INTEGER), 2)
                     ELSE '00' END, 8)),
                 'string_agg', ''), 8)),
               'string_agg', '') AS hex_pixels
      FROM b
    )
    SELECT doc_id,
           CAST({JPEG_BLOCKS_W * 8} AS BIGINT) AS width,
           CAST(hb * 8 AS BIGINT) AS height,
           CAST(s AS BIGINT) AS sum_pixels,
           md5(hex_pixels) AS pixel_md5
    FROM px
    """,
    doc="REAL LOSSY-codec round trip (r13 — baseline JPEG, the last "
    "image slice of the codec stub retired): per document, each text "
    f"byte becomes one constant 8x8 block ({JPEG_BLOCKS_W} blocks per "
    "row, zero-padded), encode_jpeg writes a genuine baseline JFIF "
    "stream — DCT, quantization, zigzag, DC-differential + run-length "
    "Huffman coding with the Annex K luminance tables, byte stuffing, "
    "full marker segments — and decode_jpeg Huffman-decodes, "
    "dequantizes, and inverse-DCTs it back. With the all-ones "
    "quantization table a constant block round-trips EXACTLY (AC "
    "coefficients are mathematically zero; DC float error ~1e-13 "
    "rounds away), so every emitted stat comes from DECODED pixels "
    "and the oracle replays the 64x byte expansion without a DCT: "
    "sum_pixels = 64 x byte sum, pixel_md5 hashes the decoded array's "
    "uppercase hex row-major. Lossy-mode fidelity (standard tables, "
    "arbitrary content) is pinned by PSNR tests, not by this oracle. "
    "Map-only over Arrow batches; the DCT is one einsum across all "
    "blocks of an image.",
    tags=["multimodal"],
)
def mm_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 3 == 1
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    # map-only work parallelizes by INPUT SPLITS: a small local parquet
    # is one unsplittable row group = one core for the whole codec pass.
    # One round-robin exchange of the (id, payload) rows rescues that;
    # at cluster scale scans have thousands of splits and this never
    # fires.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() * 2 < par:
        docs = docs.repartition(par)

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as np

        ones = np.ones(64, dtype=np.int64)
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "sum_pixels", "pixel_md5",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                hb = max(1, -(-len(data) // JPEG_BLOCKS_W))
                padded = np.zeros(hb * JPEG_BLOCKS_W, dtype=np.uint8)
                padded[: len(data)] = data
                # each byte -> one constant 8x8 block, raster order
                img = np.kron(
                    padded.reshape(hb, JPEG_BLOCKS_W),
                    np.ones((8, 8), dtype=np.uint8),
                )
                dec = decode_jpeg(encode_jpeg(img, quant=ones))
                dp = dec["pixels"]
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["sum_pixels"].append(int(dp.astype(np.int64).sum()))
                rows["pixel_md5"].append(
                    _hashlib.md5(
                        dp.tobytes().hex().upper().encode("ascii")
                    ).hexdigest()
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        roundtrip,
        schema="doc_id long, width long, height long, sum_pixels long, "
        "pixel_md5 string",
    )
