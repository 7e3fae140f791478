"""Pure-stdlib baseline JPEG (JFIF, SOF0) codec for the multimodal seam.

Real training corpora are overwhelmingly JPEG; this closes the most
common real-data path the same way PNG/WAV/Y4M were closed — no image
library, just the ITU T.81 baseline sequential process re-implemented
with numpy for the 8x8 block math:

- ``decode_jpeg_pixels``: marker walk (DQT/SOF0/DHT/SOS/DRI), Huffman
  entropy decode with byte-unstuffing and restart-marker handling,
  dequantize, inverse zigzag, 2-D IDCT (orthonormal matrix form),
  chroma upsampling for sampling factors 1-2, YCbCr->RGB. Handles the
  files real cameras/libjpeg emit (baseline, 4:4:4 / 4:2:2 / 4:2:0,
  optional restart intervals); progressive (SOF2) raises.
- ``encode_jpeg``: minimal spec-valid baseline encoder (4:4:4, one
  shared DC + one shared AC Huffman table, canonical codes generated in
  code — decoders read tables from the DHT segment, so file-embedded
  tables need not match Annex K). Used for the round-trip goldens and
  for thumbnail output.

The reference converter (JsonConverter.java) has no media path at all —
this layer exists for the 100 TB training-data pipeline the survey adds
on top (SURVEY.md T11).
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard Annex K luminance/chrominance quantization tables (natural
# row-major order), scaled by quality at encode time; decoders read the
# scaled tables back from the file's DQT segments
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _dct_matrix():
    """Orthonormal 8x8 DCT-II basis: forward F = D f D^T, inverse
    f = D^T F D — exactly JPEG's FDCT/IDCT up to the level shift."""
    import numpy as np

    n = np.arange(8)
    D = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    D[0] *= 1 / (2 ** 0.5)
    return D * 0.5


# ---------------------------------------------------------------------------
# Huffman tables (canonical construction — encoder side)
# ---------------------------------------------------------------------------


def _canonical_codes(sym_lens):
    """(symbol, code_length) list -> {symbol: (code, length)} canonical
    Huffman assignment (JPEG ordering: by length, then listing order).
    Validates the Kraft sum stays < 1 so no code is all ones (padding
    bits must not decode as a symbol)."""
    assert sum(2 ** -l for _, l in sym_lens) < 1.0, "Huffman table overfull"
    ordered = sorted(range(len(sym_lens)), key=lambda i: (sym_lens[i][1], i))
    codes, code, prev_len = {}, 0, 0
    for i in ordered:
        sym, length = sym_lens[i]
        code <<= length - prev_len
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


def _dht_payload(table_class, table_id, codes):
    """Serialize a code map into the DHT wire format (BITS + VALS)."""
    by_len: dict[int, list[int]] = {}
    for sym, (code, length) in sorted(codes.items(), key=lambda kv: (kv[1][1], kv[1][0])):
        by_len.setdefault(length, []).append(sym)
    bits = [len(by_len.get(l, [])) for l in range(1, 17)]
    vals = [s for l in range(1, 17) for s in by_len.get(l, [])]
    return bytes([(table_class << 4) | table_id] + bits + vals)


def _encoder_tables():
    """One shared DC + one shared AC table for every component.
    Canonical codes generated here; the decoder reads them back from the
    DHT segment, so Annex-K equality is irrelevant for validity."""
    dc = _canonical_codes([(c, l) for c, l in zip(
        range(12), [2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9])])
    ac_syms = [(0x01, 2), (0x02, 2), (0x03, 3), (0x00, 4), (0x04, 4), (0x11, 4)]
    rest = [rs for rs in (
        [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
    ) if rs not in {s for s, _ in ac_syms}]
    ac = _canonical_codes(ac_syms + [(rs, 12) for rs in rest])
    return dc, ac


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _scale_quant(table, quality):
    """libjpeg quality scaling: 50 -> table as-is, higher -> finer."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [max(1, min(255, (t * scale + 50) // 100)) for t in table]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v):
    return v.bit_length() if v > 0 else (-v).bit_length()


def _encode_block(bw, coeffs, dc_codes, ac_codes, pred):
    """Huffman-encode one quantized 8x8 block (zigzag order)."""
    diff = int(coeffs[0]) - pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]
            bw.write(c, l)  # ZRL
            run -= 16
        cat = _category(v)
        c, l = ac_codes[(run << 4) | cat]
        bw.write(c, l)
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]
        bw.write(c, l)  # EOB
    return int(coeffs[0])


def encode_jpeg(
    pixels, quality: int = 75, subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JFIF encoder: grayscale (h, w) or RGB (h, w, 3)
    uint8 -> JPEG bytes. One shared DC/AC Huffman table pair (canonical
    codes; decoders read them from DHT), quality-scaled Annex K quant
    tables. ``subsample``: "444" (one block per component per MCU) or
    "420" (2x2 luma + box-averaged chroma — the shape real cameras
    emit). ``restart_interval`` > 0 inserts RSTn markers every that
    many MCUs (DRI segment), resetting DC prediction."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not gray and px.shape[2] != 3:
        raise ValueError("encode_jpeg takes (h,w) gray or (h,w,3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be 444 or 420")
    sub = subsample == "420" and not gray

    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    qtabs = [qluma] if gray else [qluma, qchroma]
    D = _dct_matrix()
    dc_codes, ac_codes = _encoder_tables()

    # sampling factors per component and MCU geometry
    samps = [(1, 1)] if gray else ([(2, 2), (1, 1), (1, 1)] if sub else
                                   [(1, 1), (1, 1), (1, 1)])
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def _prep(plane, hs, vs):
        """Downsample (box average) to the component's resolution, then
        edge-pad to this component's MCU-grid block multiple."""
        if (hs, vs) != (hmax, vmax):
            ry, rx = vmax // vs, hmax // hs
            ph = -(-plane.shape[0] // ry) * ry
            pw = -(-plane.shape[1] // rx) * rx
            p = np.pad(plane, ((0, ph - plane.shape[0]),
                               (0, pw - plane.shape[1])), mode="edge")
            plane = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        return np.pad(plane, ((0, th - plane.shape[0]),
                              (0, tw - plane.shape[1])), mode="edge")

    comps = [_prep(p, *samps[ci]) for ci, p in enumerate(planes)]
    bw = _BitWriter()
    preds = [0] * len(planes)
    zz_idx = np.array(ZIGZAG)
    qzs = [
        np.array(qtabs[min(ci, len(qtabs) - 1)], dtype=np.float64)[zz_idx]
        for ci in range(len(planes))
    ]

    def _block(ci, y0, x0):
        block = comps[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
        F = D @ block @ D.T
        coeffs = np.round(F.reshape(64)[zz_idx] / qzs[ci]).astype(np.int64)
        # baseline range limit: quantized AC must fit category <= 10
        # (orthonormal AC can reach +-1024 when divisors are 1)
        np.clip(coeffs[1:], -1023, 1023, out=coeffs[1:])
        preds[ci] = _encode_block(bw, coeffs, dc_codes, ac_codes, preds[ci])

    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                hs, vs = samps[ci]
                for v in range(vs):
                    for hh in range(hs):
                        _block(ci, (my * vs + v) * 8, (mx * hs + hh) * 8)
            mcu_count += 1
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for tid, q in enumerate(qtabs):
        zz = bytes(q[ZIGZAG[k]] for k in range(64))
        out.append(seg(0xDB, bytes([tid]) + zz))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, len(qtabs) - 1)])
    out.append(seg(0xC0, sof))
    out.append(seg(0xC4, _dht_payload(0, 0, dc_codes)))
    out.append(seg(0xC4, _dht_payload(1, 0, ac_codes)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(ncomp)
    ) + bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(bytes(bw.out))
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs 0xFF00, stops at markers.
    ``restart()`` byte-aligns and steps over an RSTn marker."""

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                raise ValueError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self):
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _RestartPending(Exception):
    pass


def _build_decode_table(bits, vals):
    """DHT BITS/VALS -> {(length, code): symbol} canonical map."""
    if len(bits) < 16 or sum(bits) > len(vals):
        raise ValueError("truncated DHT segment")
    table, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def _huff_decode(br, table):
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v, cat):
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg_pixels(payload: bytes):
    """Baseline sequential JFIF decode -> (h, w) uint8 for grayscale or
    (h, w, 3) uint8 RGB. Raises ValueError on corrupt streams and
    NotImplementedError for progressive (SOF2) / arithmetic coding."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    pos = 2
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = body[i + 1:i + 1 + n]
                vals = (
                    list(struct.unpack(f">{64}H", raw)) if prec else list(raw)
                )
                # stored zigzag -> natural order
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = vals[k]
                qt[tid] = nat
                i += 1 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) is supported"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                scan.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0x0F})
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = sof["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = sof["w"], sof["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    D = _dct_matrix()
    inv_zz = np.argsort(np.array(ZIGZAG))  # natural idx -> zigzag pos
    br = _BitReader(payload, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = {c["id"]: 0 for c in comps}
            try:
                for sc in scan:
                    comp = by_id[sc["id"]]
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            coeffs = np.zeros(64, dtype=np.float64)
                            sym = _huff_decode(br, huff[(0, sc["dc"])])
                            diff = _extend(br.bits(sym), sym) if sym else 0
                            preds[sc["id"]] += diff
                            coeffs[0] = preds[sc["id"]]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(br, huff[(1, sc["ac"])])
                                if rs == 0x00:
                                    break  # EOB
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                k += rs >> 4
                                cat = rs & 0x0F
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                coeffs[k] = _extend(br.bits(cat), cat)
                                k += 1
                            q = np.array(qt[comp["tq"]], dtype=np.float64)
                            blk = (coeffs[inv_zz] * q).reshape(8, 8)
                            px = D.T @ blk @ D + 128.0
                            y0 = (my * comp["v"] + v) * 8
                            x0 = (mx * comp["h"] + hh) * 8
                            planes[sc["id"]][y0:y0 + 8, x0:x0 + 8] = px
            except _RestartPending:
                raise ValueError("restart marker at unexpected MCU position")
            mcu_count += 1

    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes, feature_dim: int = 8) -> dict:
    """JPEG decode + features, same contract as decode_png: dims +
    L1-normalized ``feature_dim``-bin histogram of decoded pixels."""
    import numpy as np

    px = decode_jpeg_pixels(payload)
    hist, _ = np.histogram(px, bins=feature_dim, range=(0, 256))
    return {"width": int(px.shape[1]), "height": int(px.shape[0]),
            "n_frames": 1,
            "features": (hist / max(1, px.size)).astype(float).tolist()}
