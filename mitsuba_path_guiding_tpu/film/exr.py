"""OpenEXR scanline codec (pure numpy): NONE/RLE/ZIPS/ZIP/PIZ/PXR24 read,
NONE/ZIP write, HALF/FLOAT/UINT channels, arbitrary channel sets.

Counterpart of the reference's EXR paths in
/root/reference/src/libcore/bitmap.cpp (readOpenEXR ~line 2500s,
writeOpenEXR; the reference links the OpenEXR library and writes
ZIP-compressed files by default) — round 1 could only read the
uncompressed scanline files this package itself writes, which meant the
reference's own fixtures (e.g. data/tests/envmap.exr, PIZ-compressed
HALF) could not be loaded.  This module implements the container and the
three classic codecs from the OpenEXR 2.x format spec:

  * ZIP/ZIPS  — zlib + byte delta-predictor + two-half interleave
  * RLE       — run-length + the same predictor/interleave
  * PIZ       — 16-bit wavelet (wav2) + canonical Huffman, 32-line blocks
  * PXR24     — zlib over delta-coded byte planes (float stored as 24 bit)

Everything is host-side I/O (SURVEY §2.8 item 8: bitmap conversions are
host-side OK).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"\x76\x2f\x31\x01"

CH_UINT, CH_HALF, CH_FLOAT = 0, 1, 2
_DTYPES = {CH_UINT: np.uint32, CH_HALF: np.float16, CH_FLOAT: np.float32}
_SIZES = {CH_UINT: 4, CH_HALF: 2, CH_FLOAT: 4}

NO_COMPRESSION, RLE_COMPRESSION, ZIPS_COMPRESSION, ZIP_COMPRESSION = 0, 1, 2, 3
PIZ_COMPRESSION, PXR24_COMPRESSION = 4, 5
_LINES_PER_BLOCK = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16}


# ---------------------------------------------------------------- container

def _parse_header(data):
    assert data[:4] == MAGIC, "not an EXR file"
    version = struct.unpack_from("<I", data, 4)[0]
    if version & 0x200:
        raise ValueError("tiled EXR not supported (scanline only)")
    if version & (0x800 | 0x1000):
        raise ValueError("deep/multipart EXR not supported")
    off = 8
    attrs = {}
    while True:
        end = data.index(b"\x00", off)
        name = data[off:end].decode()
        off = end + 1
        if not name:
            break
        end = data.index(b"\x00", off)
        typ = data[off:end].decode()
        off = end + 1
        (size,) = struct.unpack_from("<I", data, off)
        off += 4
        attrs[name] = (typ, data[off : off + size])
        off += size
    return attrs, off


def _parse_channels(raw):
    """chlist -> list of (name, pixel_type) sorted as stored (alphabetical)."""
    out = []
    off = 0
    while raw[off] != 0:
        end = raw.index(b"\x00", off)
        name = raw[off:end].decode()
        off = end + 1
        ptype, _plin, _xs, _ys = struct.unpack_from("<iiii", raw, off)
        # second i32 packs pLinear+reserved; x/y sampling follow
        off += 16
        out.append((name, ptype))
    return out


# ------------------------------------------------- predictor / interleave

def _predictor_decode(b: np.ndarray) -> np.ndarray:
    d = b.astype(np.int64) - 128
    d[0] = b[0]
    return (np.cumsum(d) & 0xFF).astype(np.uint8)


def _predictor_encode(b: np.ndarray) -> np.ndarray:
    out = (b.astype(np.int64) - np.roll(b, 1).astype(np.int64) + 128) & 0xFF
    out[0] = b[0]
    return out.astype(np.uint8)


def _deinterleave(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    h = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = b[:h]
    out[1::2] = b[h:]
    return out


def _interleave(b: np.ndarray) -> np.ndarray:
    return np.concatenate([b[0::2], b[1::2]])


def _zip_decode(raw: bytes, expect: int) -> bytes:
    if len(raw) == expect:
        return raw
    b = np.frombuffer(zlib.decompress(raw), np.uint8)
    return _deinterleave(_predictor_decode(b)).tobytes()


def _zip_encode(raw: bytes) -> bytes:
    b = _predictor_encode(_interleave(np.frombuffer(raw, np.uint8)))
    out = zlib.compress(b.tobytes(), 6)
    return out if len(out) < len(raw) else raw


def _rle_decode(raw: bytes, expect: int) -> bytes:
    if len(raw) == expect:
        return raw
    out = bytearray()
    i = 0
    while i < len(raw):
        n = struct.unpack_from("<b", raw, i)[0]
        i += 1
        if n < 0:
            out += raw[i : i - n]
            i += -n
        else:
            out += raw[i : i + 1] * (n + 1)
            i += 1
    b = np.frombuffer(bytes(out), np.uint8)
    return _deinterleave(_predictor_decode(b)).tobytes()


# ------------------------------------------------------------------- PIZ

_HUF_ENCBITS = 16
_HUF_ENCSIZE = (1 << _HUF_ENCBITS) + 1
_HUF_DECBITS = 14
_HUF_DECSIZE = 1 << _HUF_DECBITS
_SHORT_ZEROCODE_RUN = 59
_LONG_ZEROCODE_RUN = 63
_SHORTEST_LONG_RUN = 2 + _LONG_ZEROCODE_RUN - _SHORT_ZEROCODE_RUN


class _BitReader:
    __slots__ = ("data", "i", "c", "lc")

    def __init__(self, data, start=0):
        self.data = data
        self.i = start
        self.c = 0
        self.lc = 0

    def get(self, nbits):
        while self.lc < nbits:
            self.c = (self.c << 8) | self.data[self.i]
            self.i += 1
            self.lc += 8
        self.lc -= nbits
        return (self.c >> self.lc) & ((1 << nbits) - 1)


def _huf_unpack_enc_table(reader, im, iM):
    hcode = np.zeros(_HUF_ENCSIZE, np.int64)
    i = im
    while i <= iM:
        l = reader.get(6)
        if l == _LONG_ZEROCODE_RUN:
            zerun = reader.get(8) + _SHORTEST_LONG_RUN
            i += zerun
        elif l >= _SHORT_ZEROCODE_RUN:
            i += l - _SHORT_ZEROCODE_RUN + 2
        else:
            hcode[i] = l
            i += 1
    # canonical code assignment (ImfHuf.cpp hufCanonicalCodeTable)
    n = np.zeros(59, np.int64)
    for l in hcode[hcode > 0]:
        n[l] += 1
    c = 0
    base = np.zeros(59, np.int64)
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        base[i] = c
        c = nc
    nxt = base.copy()
    codes = np.zeros(_HUF_ENCSIZE, np.int64)
    idx = np.nonzero(hcode > 0)[0]
    for i in idx:
        l = hcode[i]
        codes[i] = nxt[l]
        nxt[l] += 1
    return hcode, codes


def _huf_decode(data, n_out):
    im, iM, _tlen, nbits = struct.unpack_from("<IIII", data, 0)
    reader = _BitReader(data, 20)
    lengths, codes = _huf_unpack_enc_table(reader, im, iM)

    # short-code lookup table: 14-bit window -> (symbol, length)
    table_sym = np.full(_HUF_DECSIZE, -1, np.int64)
    table_len = np.zeros(_HUF_DECSIZE, np.int64)
    longs = {}
    for s in np.nonzero(lengths > 0)[0]:
        l = int(lengths[s])
        c = int(codes[s])
        if l <= _HUF_DECBITS:
            start = c << (_HUF_DECBITS - l)
            table_sym[start : start + (1 << (_HUF_DECBITS - l))] = s
            table_len[start : start + (1 << (_HUF_DECBITS - l))] = l
        else:
            longs[(l, c)] = s

    out = np.zeros(n_out, np.uint16)
    k = 0
    rlc = iM
    # the encoder byte-aligns after the packed table (ImfHuf.cpp
    # hufPackEncTable flushes its partial byte): start fresh at reader.i
    c = 0
    lc = 0
    bi = 0
    # the bitstream is exactly nbits long; the last byte's low-order bits
    # are padding and must be dropped once input is exhausted
    # (ImfHuf.cpp hufDecode: "c >>= (8 - ni) & 7")
    nd = (nbits + 7) // 8
    data_v = data[reader.i : reader.i + nd]
    dropped_pad = False
    while k < n_out:
        while lc < _HUF_DECBITS and bi < nd:
            c = (c << 8) | data_v[bi]
            bi += 1
            lc += 8
        if bi >= nd and not dropped_pad:
            pad = nd * 8 - nbits
            if lc >= pad:
                c >>= pad
                lc -= pad
            dropped_pad = True
        if lc < _HUF_DECBITS:  # tail: left-align remaining bits
            pad = _HUF_DECBITS - lc
            idx = (c << pad) & (_HUF_DECSIZE - 1)
        else:
            idx = (c >> (lc - _HUF_DECBITS)) & (_HUF_DECSIZE - 1)
        s = table_sym[idx]
        if s >= 0:
            l = int(table_len[idx])
            if lc < l:
                raise ValueError("EXR PIZ: huffman bitstream exhausted")
            lc -= l
        else:
            # long code: extend bit by bit
            found = False
            for l in range(_HUF_DECBITS + 1, 59):
                while lc < l and bi < nd:
                    c = (c << 8) | data_v[bi]
                    bi += 1
                    lc += 8
                if lc < l:
                    break
                cand = (c >> (lc - l)) & ((1 << l) - 1)
                if (l, cand) in longs:
                    s = longs[(l, cand)]
                    lc -= l
                    found = True
                    break
            if not found:
                raise ValueError("EXR PIZ: invalid huffman code")
        if s == rlc:
            while lc < 8 and bi < nd:
                c = (c << 8) | data_v[bi]
                bi += 1
                lc += 8
            run = (c >> (lc - 8)) & 0xFF
            lc -= 8
            if k == 0:
                raise ValueError("EXR PIZ: run-length with no previous value")
            out[k : k + run] = out[k - 1]
            k += run
        else:
            out[k] = s
            k += 1
    return out


def _wdec14(l, h):
    ls = l.astype(np.int16).astype(np.int32)
    hs = h.astype(np.int16).astype(np.int32)
    ai = ls + (hs & 1) + (hs >> 1)
    a = ai.astype(np.int16).astype(np.uint16)
    b = (ai - hs).astype(np.int16).astype(np.uint16)
    return a, b


_NBITS = 16
_A_OFFSET = 1 << (_NBITS - 1)
_MOD_MASK = (1 << _NBITS) - 1


def _wdec16(l, h):
    m = l.astype(np.int64)
    d = h.astype(np.int64)
    bb = (m - (d >> 1)) & _MOD_MASK
    aa = (d + bb - _A_OFFSET) & _MOD_MASK
    return aa.astype(np.uint16), bb.astype(np.uint16)


def _wav2_decode(buf, nx, ox, ny, oy, mx):
    """In-place 2D wavelet inverse (ImfWav.cpp wav2Decode), vectorized per
    level over the regular grid positions."""
    wdec = _wdec14 if mx < (1 << 14) else _wdec16
    n = min(nx, ny)
    p = 1
    while p <= n:
        p <<= 1
    p >>= 1
    p2 = p
    p >>= 1
    view = buf  # flat uint16, logical (ny, nx) with strides (oy, ox)
    while p >= 1:
        ys = np.arange(0, ny - p2 + 1, p2)
        xs = np.arange(0, nx - p2 + 1, p2)
        if len(ys) and len(xs):
            iy = (ys[:, None] * oy + xs[None, :] * ox).ravel()
            i00 = iy
            i01 = iy + p * ox
            i10 = iy + p * oy
            i11 = iy + p * oy + p * ox
            v00, v10 = wdec(view[i00], view[i10])
            v01, v11 = wdec(view[i01], view[i11])
            a00, a01 = wdec(v00, v01)
            a10, a11 = wdec(v10, v11)
            view[i00], view[i01], view[i10], view[i11] = a00, a01, a10, a11
            # odd column (nx & p): pairs (px, px+p*oy) at x = last+p2?
        if nx & p and len(ys):
            x_last = xs[-1] + p2 if len(xs) else 0
            if x_last < nx:
                idx = ys * oy + x_last * ox
                a, b = wdec(view[idx], view[idx + p * oy])
                view[idx], view[idx + p * oy] = a, b
        if ny & p and len(xs):
            y_last = ys[-1] + p2 if len(ys) else 0
            if y_last < ny:
                idx = y_last * oy + xs * ox
                a, b = wdec(view[idx], view[idx + p * ox])
                view[idx], view[idx + p * ox] = a, b
        p2 = p
        p >>= 1
    return buf


def _piz_decode(raw: bytes, channels, w, lines):
    """Decode one PIZ block -> raw scanline bytes (channel-major per line)."""
    off = 0
    min_nz, max_nz = struct.unpack_from("<HH", raw, off)
    off += 4
    bitmap = np.zeros(8192, np.uint8)
    if min_nz <= max_nz:
        n = max_nz - min_nz + 1
        bitmap[min_nz : max_nz + 1] = np.frombuffer(raw[off : off + n], np.uint8)
        off += n
    (hlen,) = struct.unpack_from("<I", raw, off)
    off += 4

    # reverse LUT
    bits = np.unpackbits(bitmap, bitorder="little")
    used = np.nonzero(bits)[0]
    if len(used) == 0 or used[0] != 0:
        used = np.concatenate([[0], used]).astype(np.int64)
    max_value = len(used) - 1

    sizes = [(_SIZES[pt] // 2) for _, pt in channels]
    n_tot = sum(w * lines * s for s in sizes)
    tmp = _huf_decode(raw[off : off + hlen], n_tot)

    # per-channel, per-16-bit-component wavelet inverse
    # (ImfPizCompressor.cpp: wav2Decode(start + j, nx, size, ny, nx*size))
    start = 0
    views = []
    for (name, pt), s in zip(channels, sizes):
        cnt = w * lines * s
        chan = tmp[start : start + cnt]
        for j in range(s):
            _wav2_decode(chan[j:], w, s, lines, w * s, max_value)
        start += cnt
        views.append(chan)

    # apply LUT
    lut = used.astype(np.uint16)
    for v in views:
        np.take(lut, v, out=v)

    # interleave back to scanline order
    out = bytearray()
    for y in range(lines):
        for v, s in zip(views, sizes):
            row = v[y * w * s : (y + 1) * w * s]
            out += row.tobytes()
    return bytes(out)


def _pxr24_decode(raw: bytes, channels, w, lines):
    data = zlib.decompress(raw)
    out = bytearray()
    off = 0
    for _y in range(lines):
        for name, pt in channels:
            if pt == CH_FLOAT:
                planes = np.frombuffer(data[off : off + 3 * w], np.uint8).reshape(3, w)
                off += 3 * w
                planes = np.cumsum(planes.astype(np.int64), axis=1) & 0xFF
                val = (
                    (planes[0].astype(np.uint32) << 24)
                    | (planes[1].astype(np.uint32) << 16)
                    | (planes[2].astype(np.uint32) << 8)
                )
                out += val.astype("<u4").tobytes()
            elif pt == CH_HALF:
                planes = np.frombuffer(data[off : off + 2 * w], np.uint8).reshape(2, w)
                off += 2 * w
                planes = np.cumsum(planes.astype(np.int64), axis=1) & 0xFF
                val = (planes[0].astype(np.uint16) << 8) | planes[1].astype(np.uint16)
                out += val.astype("<u2").tobytes()
            else:  # UINT
                planes = np.frombuffer(data[off : off + 4 * w], np.uint8).reshape(4, w)
                off += 4 * w
                planes = np.cumsum(planes.astype(np.int64), axis=1) & 0xFF
                val = (
                    (planes[0].astype(np.uint32) << 24)
                    | (planes[1].astype(np.uint32) << 16)
                    | (planes[2].astype(np.uint32) << 8)
                    | planes[3].astype(np.uint32)
                )
                out += val.astype("<u4").tobytes()
    return bytes(out)


# ------------------------------------------------------------------ read

def read_exr(path: str):
    """Read a scanline EXR.  Returns (channels: {name: (h, w) float32
    (uint channels come back as float32-cast uint32)}, attrs dict)."""
    with open(path, "rb") as f:
        data = f.read()
    attrs, off = _parse_header(data)
    channels = _parse_channels(attrs["channels"][1])
    comp = attrs["compression"][1][0]
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    lpb = _LINES_PER_BLOCK[comp]
    n_blocks = (h + lpb - 1) // lpb
    off += 8 * n_blocks  # offset table (we read sequentially)

    px_bytes = sum(_SIZES[pt] for _, pt in channels)
    out = {name: np.zeros((h, w), np.float32) for name, _ in channels}

    for _ in range(n_blocks):
        y, size = struct.unpack_from("<iI", data, off)
        off += 8
        raw = data[off : off + size]
        off += size
        y -= y0
        lines = min(lpb, h - y)
        expect = lines * w * px_bytes
        if comp in (NO_COMPRESSION,):
            dec = raw
        elif comp in (ZIPS_COMPRESSION, ZIP_COMPRESSION):
            dec = _zip_decode(raw, expect)
        elif comp == RLE_COMPRESSION:
            dec = _rle_decode(raw, expect)
        elif comp == PIZ_COMPRESSION:
            dec = raw if len(raw) == expect else _piz_decode(raw, channels, w, lines)
        elif comp == PXR24_COMPRESSION:
            dec = _pxr24_decode(raw, channels, w, lines)
        else:
            raise ValueError(f"unsupported EXR compression {comp}")
        p = 0
        for line in range(lines):
            for name, pt in channels:
                nb = w * _SIZES[pt]
                row = np.frombuffer(dec[p : p + nb], dtype=_DTYPES[pt])
                out[name][y + line] = row.astype(np.float32)
                p += nb
    return out, attrs


def read_exr_rgb(path: str) -> np.ndarray:
    """(h, w, 3) float32 from the R/G/B (or Y) channels."""
    chans, _ = read_exr(path)
    if all(c in chans for c in "RGB"):
        return np.stack([chans["R"], chans["G"], chans["B"]], axis=-1)
    if "Y" in chans:
        return np.repeat(chans["Y"][..., None], 3, axis=-1)
    first = next(iter(chans.values()))
    return np.repeat(first[..., None], 3, axis=-1)


# ----------------------------------------------------------------- write

def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return name.encode() + b"\x00" + typ.encode() + b"\x00" + struct.pack("<I", len(payload)) + payload


def write_exr(path: str, channels, compression: str = "zip", half: bool = True):
    """Write a scanline EXR.  ``channels``: dict {name: (h, w) float32}
    or an (h, w, 3) array (written as B, G, R ordering per EXR convention
    of alphabetical channel sort).  compression: none|zips|zip."""
    if not isinstance(channels, dict):
        arr = np.asarray(channels, np.float32)
        channels = {"R": arr[..., 0], "G": arr[..., 1], "B": arr[..., 2]}
    names = sorted(channels)
    h, w = channels[names[0]].shape
    comp = {"none": NO_COMPRESSION, "zips": ZIPS_COMPRESSION, "zip": ZIP_COMPRESSION}[compression]
    ptype = CH_HALF if half else CH_FLOAT
    dtype = _DTYPES[ptype]

    chlist = b""
    for n in names:
        chlist += n.encode() + b"\x00" + struct.pack("<iiii", ptype, 0, 1, 1)
    chlist += b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = MAGIC + struct.pack("<I", 2)
    header += _attr("channels", "chlist", chlist)
    header += _attr("compression", "compression", bytes([comp]))
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    lpb = _LINES_PER_BLOCK[comp]
    n_blocks = (h + lpb - 1) // lpb
    blocks = []
    for b in range(n_blocks):
        y = b * lpb
        lines = min(lpb, h - y)
        raw = bytearray()
        for line in range(lines):
            for n in names:
                raw += np.ascontiguousarray(channels[n][y + line], np.float32).astype(dtype).tobytes()
        raw = bytes(raw)
        if comp in (ZIPS_COMPRESSION, ZIP_COMPRESSION):
            enc = _zip_encode(raw)
        else:
            enc = raw
        blocks.append((y, enc))

    with open(path, "wb") as f:
        f.write(header)
        pos = len(header) + 8 * n_blocks
        for y, enc in blocks:
            f.write(struct.pack("<Q", pos))
            pos += 8 + len(enc)
        for y, enc in blocks:
            f.write(struct.pack("<iI", y, len(enc)))
            f.write(enc)
