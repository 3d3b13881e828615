#!/usr/bin/env python3
"""Encode a short HEVC stream with the REAL system libx265 and print
the Annex-B bytes + the encode parameters as JSON — the independent
encoder oracle HevcMetaSpec pins graft's HEVC metadata parser against
(the vp8_probe.py / libwebp pattern: a system codec library driven via
ctypes, no vendored code).

The x265 public API is used through its extern-C symbols
(x265_param_alloc/x265_param_parse are opaque-pointer calls, so no
struct layouts are needed for configuration). x265_picture's leading
layout (pts/dts/userData/planes[3]/stride[3]/bitDepth) is the stable
public prefix of x265.h; bitDepth==8 at offset 60 after
x265_picture_init is asserted before use.

Usage: python3 scripts/hevc_oracle.py WxH keyint frames bframes
Prints: {"w":..,"h":..,"keyint":..,"frames":..,"bframes":..,
         "nal_types":[..], "stream_b64":"..."}
"""
import base64
import ctypes
import json
import struct
import sys
from ctypes import POINTER, byref, c_char_p, c_uint8, c_uint32, c_void_p


class Nal(ctypes.Structure):
    _fields_ = [("type", c_uint32), ("sizeBytes", c_uint32),
                ("payload", POINTER(c_uint8))]


def main():
    res, keyint, frames, bframes = sys.argv[1:5]
    w, h = (int(x) for x in res.split("x"))
    lib = ctypes.CDLL("/lib/x86_64-linux-gnu/libx265.so.199")
    lib.x265_param_alloc.restype = c_void_p
    lib.x265_picture_alloc.restype = c_void_p
    lib.x265_encoder_open_199.restype = c_void_p
    lib.x265_encoder_open_199.argtypes = [c_void_p]
    lib.x265_param_default_preset.argtypes = [c_void_p, c_char_p, c_char_p]
    lib.x265_param_parse.argtypes = [c_void_p, c_char_p, c_char_p]
    lib.x265_picture_init.argtypes = [c_void_p, c_void_p]
    lib.x265_encoder_headers.argtypes = [
        c_void_p, POINTER(POINTER(Nal)), POINTER(c_uint32)]
    lib.x265_encoder_encode.argtypes = [
        c_void_p, POINTER(POINTER(Nal)), POINTER(c_uint32), c_void_p, c_void_p]
    lib.x265_encoder_close.argtypes = [c_void_p]

    p = lib.x265_param_alloc()
    assert p, "x265_param_alloc"
    assert lib.x265_param_default_preset(p, b"ultrafast", None) == 0
    opts = [(b"input-res", res.encode()), (b"fps", b"30"),
            (b"keyint", str(keyint).encode()),
            (b"min-keyint", str(keyint).encode()),
            (b"bframes", str(bframes).encode()),
            (b"scenecut", b"0"), (b"repeat-headers", b"1"),
            (b"log-level", b"none"), (b"frame-threads", b"1")]
    for k, v in opts:
        assert lib.x265_param_parse(p, k, v) == 0, (k, v)
    enc = lib.x265_encoder_open_199(p)
    assert enc, "x265_encoder_open"

    pic = lib.x265_picture_alloc()
    lib.x265_picture_init(p, pic)
    # assert the public-prefix layout before poking it
    assert struct.unpack_from(
        "<i", bytes((c_uint8 * 64).from_address(pic)), 60)[0] == 8, \
        "x265_picture layout changed (bitDepth not at offset 60)"
    ysize, csize = w * h, (w // 2) * (h // 2)
    ybuf = (c_uint8 * ysize)()
    ubuf = (c_uint8 * csize)()
    vbuf = (c_uint8 * csize)()

    def put_ptr(off, val):
        struct.pack_into("<Q", (c_uint8 * 8).from_address(pic + off), 0, val)

    def put_int(off, val):
        struct.pack_into("<i", (c_uint8 * 4).from_address(pic + off), 0, val)

    put_ptr(24, ctypes.addressof(ybuf))
    put_ptr(32, ctypes.addressof(ubuf))
    put_ptr(40, ctypes.addressof(vbuf))
    put_int(48, w)
    put_int(52, w // 2)
    put_int(56, w // 2)
    pout = lib.x265_picture_alloc()
    lib.x265_picture_init(p, pout)

    nals = POINTER(Nal)()
    n = c_uint32()
    stream = bytearray()
    types = []

    def drain():
        for i in range(n.value):
            nal = nals[i]
            types.append(int(nal.type))
            stream.extend(bytes(bytearray(
                nal.payload[j] for j in range(nal.sizeBytes))))

    for f in range(int(frames)):
        # deterministic moving gradient so frames differ
        for i in range(ysize):
            ybuf[i] = (f * 31 + (i * 7) // (w or 1)) % 256
        for i in range(csize):
            ubuf[i] = (128 + f * 5) % 256
            vbuf[i] = (128 - f * 3) % 256
        struct.pack_into("<q", (c_uint8 * 8).from_address(pic + 0), 0, f)
        rc = lib.x265_encoder_encode(enc, byref(nals), byref(n), pic, pout)
        assert rc >= 0, "encode failed"
        if rc > 0:
            drain()
    while True:
        rc = lib.x265_encoder_encode(enc, byref(nals), byref(n), None, pout)
        if rc <= 0:
            break
        drain()
    lib.x265_encoder_close(enc)

    print(json.dumps({
        "w": w, "h": h, "keyint": int(keyint), "frames": int(frames),
        "bframes": int(bframes), "nal_types": types,
        "stream_b64": base64.b64encode(bytes(stream)).decode()}))


if __name__ == "__main__":
    main()
