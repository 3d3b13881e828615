#!/usr/bin/env python3
"""Decode a .webp with the REAL system libwebp and print the raw VP8
Y/U/V planes (dims + sha256 + optional hex dump) — the independent
oracle WebpLossySpec pins our VP8 decoder against. YUV output is the
spec-exact VP8 reconstruction (no RGB upsampling variance).

Usage:
  python3 scripts/vp8_probe.py <file.webp> [--dump]
  python3 scripts/vp8_probe.py --b64 <base64> [--dump]
"""
import base64
import ctypes
import hashlib
import sys

lib = ctypes.CDLL("/lib/x86_64-linux-gnu/libwebp.so.7")
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


def main():
    args = [a for a in sys.argv[1:] if a != "--dump"]
    dump = "--dump" in sys.argv
    if args[0] == "--b64":
        data = base64.b64decode(args[1])
    else:
        data = open(args[0], "rb").read()
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        print("DECODE FAILED")
        sys.exit(1)
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = b"".join(bytes(y[r * stride.value:r * stride.value + W])
                  for r in range(H))
    up = b"".join(bytes(u[r * uv_stride.value:r * uv_stride.value + cw])
                  for r in range(ch))
    vp = b"".join(bytes(v[r * uv_stride.value:r * uv_stride.value + cw])
                  for r in range(ch))
    print(f"dims {W}x{H} stride {stride.value} uv_stride {uv_stride.value}")
    print("Y sha256", hashlib.sha256(yp).hexdigest())
    print("U sha256", hashlib.sha256(up).hexdigest())
    print("V sha256", hashlib.sha256(vp).hexdigest())
    if dump:
        print("Y", yp.hex())
        print("U", up.hex())
        print("V", vp.hex())


if __name__ == "__main__":
    main()
