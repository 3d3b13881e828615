#!/usr/bin/env python3
"""Encode a short AV1 stream with the REAL system libaom and print the
low-overhead OBU bytes + per-frame packet structure as JSON — the
independent encoder oracle Av1MetaSpec pins graft's AV1 metadata
parser against (the hevc_oracle.py / vp8_probe.py pattern).

libaom is driven through its public C API via ctypes. The encoder
config struct is populated by aom_codec_enc_config_default and only
the fields at empirically-asserted offsets are poked (g_w=320@12 /
g_h=240@16 defaults are checked first, so a layout change fails
loudly, not silently). aom_image_t's public prefix (w@28, h@32,
planes@64, stride@88) is likewise asserted via the values
aom_img_alloc itself wrote.

Usage: python3 scripts/av1_oracle.py WxH keyint frames
Prints: {"w":..,"h":..,"keyint":..,"frames":..,
         "packets":[[size,is_key],..], "stream_b64":"..."}
"""
import base64
import ctypes
import json
import struct
import sys
from ctypes import POINTER, byref, c_int, c_long, c_longlong, c_uint, c_uint8, c_void_p


def u64_at(base, off):
    return struct.unpack_from(
        "<Q", bytes((c_uint8 * 8).from_address(base + off)), 0)[0]


def i32_at(base, off):
    return struct.unpack_from(
        "<i", bytes((c_uint8 * 4).from_address(base + off)), 0)[0]


def main():
    res, keyint, frames = sys.argv[1:4]
    w, h = (int(x) for x in res.split("x"))
    lib = ctypes.CDLL("/lib/x86_64-linux-gnu/libaom.so.3")
    lib.aom_codec_av1_cx.restype = c_void_p
    lib.aom_codec_enc_config_default.argtypes = [c_void_p, c_void_p, c_uint]
    lib.aom_codec_enc_init_ver.argtypes = [
        c_void_p, c_void_p, c_void_p, c_long, c_int]
    lib.aom_codec_enc_init_ver.restype = c_int
    lib.aom_img_alloc.restype = c_void_p
    lib.aom_img_alloc.argtypes = [c_void_p, c_int, c_uint, c_uint, c_uint]
    lib.aom_codec_encode.argtypes = [
        c_void_p, c_void_p, c_longlong, ctypes.c_ulong, c_long]
    lib.aom_codec_encode.restype = c_int
    lib.aom_codec_get_cx_data.restype = c_void_p
    lib.aom_codec_get_cx_data.argtypes = [c_void_p, c_void_p]
    lib.aom_codec_error.restype = ctypes.c_char_p
    lib.aom_codec_error.argtypes = [c_void_p]

    iface = lib.aom_codec_av1_cx()
    cfg = (c_uint8 * 4096)()
    assert lib.aom_codec_enc_config_default(iface, cfg, 0) == 0
    # assert the known default layout before poking anything
    assert struct.unpack_from("<I", cfg, 12)[0] == 320, "cfg layout changed (g_w)"
    assert struct.unpack_from("<I", cfg, 16)[0] == 240, "cfg layout changed (g_h)"
    assert struct.unpack_from("<I", cfg, 192)[0] == 9999, "cfg layout (kf_max_dist)"

    def put(off, val):
        struct.pack_into("<I", cfg, off, val)

    put(12, w)
    put(16, h)
    put(56, 0)              # g_lag_in_frames = 0 (in-order packets)
    put(184, 1)             # kf_mode AUTO
    put(188, int(keyint))   # kf_min_dist
    put(192, int(keyint))   # kf_max_dist
    ctx = (c_uint8 * 1024)()
    ver_ok = None
    for ver in range(0, 64):
        if lib.aom_codec_enc_init_ver(ctx, iface, cfg, 0, ver) == 0:
            ver_ok = ver
            break
    assert ver_ok is not None, "no matching AOM_ENCODER_ABI_VERSION"

    img = lib.aom_img_alloc(None, 0x102, w, h, 16)  # AOM_IMG_FMT_I420
    assert img
    assert i32_at(img, 28) == w and i32_at(img, 32) == h, "aom_image layout"
    planes = [u64_at(img, 64), u64_at(img, 72), u64_at(img, 80)]
    strides = [i32_at(img, 88 + 4 * i) for i in range(3)]
    assert strides[0] >= w and all(p for p in planes), "aom_image planes"

    stream = bytearray()
    packets = []

    def drain():
        it = c_void_p(None)
        while True:
            pkt = lib.aom_codec_get_cx_data(ctx, byref(it))
            if not pkt:
                break
            if i32_at(pkt, 0) == 0:  # AOM_CODEC_CX_FRAME_PKT
                buf = u64_at(pkt, 8)
                sz = u64_at(pkt, 16)
                flags = struct.unpack_from(
                    "<I", bytes((c_uint8 * 4).from_address(pkt + 40)), 0)[0]
                data = bytes((c_uint8 * sz).from_address(buf))
                stream.extend(data)
                packets.append([sz, flags & 1])

    for f in range(int(frames)):
        for y in range(h):
            row = bytes(((f * 29 + x * 3 + y) % 256) for x in range(w))
            ctypes.memmove(planes[0] + y * strides[0], row, w)
        half = bytes([128] * (w // 2))
        for pi in (1, 2):
            for y in range(h // 2):
                ctypes.memmove(planes[pi] + y * strides[pi], half, w // 2)
        assert lib.aom_codec_encode(ctx, img, f, 1, 0) == 0, \
            lib.aom_codec_error(ctx)
        drain()
    while True:
        assert lib.aom_codec_encode(ctx, None, -1, 1, 0) == 0
        before = len(packets)
        drain()
        if len(packets) == before:
            break

    print(json.dumps({
        "w": w, "h": h, "keyint": int(keyint), "frames": int(frames),
        "packets": packets,
        "stream_b64": base64.b64encode(bytes(stream)).decode()}))


if __name__ == "__main__":
    main()
