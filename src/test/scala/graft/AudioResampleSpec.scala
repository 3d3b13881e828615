package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WavCodec
import graft.operators.WavCodec.Audio

class AudioResampleSpec extends AnyFunSuite {

  private def mono(rate: Int, xs: Int*): Audio =
    Audio(1, rate, xs.map(_.toShort).toArray)

  test("downmixMono: floor-divided channel average, mono identity") {
    val st = Audio(2, 8000, Array[Short](10, 20, -3, -4, 5, -10))
    val m = WavCodec.downmixMono(st)
    assert(m.channels == 1 && m.sampleRate == 8000)
    // (-3 + -4) = -7 -> floor(-7/2) = -4 (not -3: floor, not truncate)
    // (5 + -10) = -5 -> floor(-5/2) = -3
    assert(m.samples.toSeq == Seq[Short](15, -4, -3))
    val already = mono(8000, 1, 2, 3)
    assert(WavCodec.downmixMono(already) eq already)
  }

  test("2:1 downsample picks exactly the even frames (agrees with decimate)") {
    val a = mono(8000, 0, 100, 200, 300, 400, 500, 600)
    val r = WavCodec.resampleLinear(a, 4000)
    assert(r.sampleRate == 4000)
    assert(r.samples.toSeq == Seq[Short](0, 200, 400, 600))
    assert(r.samples.toSeq == WavCodec.decimate(a, 2).samples.toSeq)
  }

  test("3:2 ratio interpolates odd outputs halfway (floor division)") {
    val a = mono(6000, 0, 100, 201, 300, 401, 500)
    val r = WavCodec.resampleLinear(a, 4000)
    // nOut = floor(5*4000/6000)+1 = 4; i=0:x0; i=1: idx=1 rem=2000 ->
    //   100 + floor(101*2000/4000) = 100+50 = 150
    // i=2: idx=3 rem=0 -> 300; i=3: idx=4 rem=2000 -> 401+floor(99/2)=450
    assert(r.frames == 4)
    assert(r.samples.toSeq == Seq[Short](0, 150, 300, 450))
  }

  test("upsampling keeps source samples at integer positions") {
    val a = mono(4000, -100, 100)
    val r = WavCodec.resampleLinear(a, 8000)
    // nOut = floor(1*8000/4000)+1 = 3: [-100, 0, 100]
    assert(r.samples.toSeq == Seq[Short](-100, 0, 100))
  }

  test("negative-slope interpolation floors toward -inf (SQL // replayable)") {
    val a = mono(4000, 100, -100)
    val r = WavCodec.resampleLinear(a, 6000)
    // nOut = floor(1*6000/4000)+1 = 2; i=1: idx=0 rem=4000 ->
    // 100 + floor(-200*4000/6000) = 100 + floor(-133.33) = 100 - 134
    // (truncation would give -133: the floor contract is observable)
    assert(r.samples.toSeq == Seq[Short](100, -34))
  }

  test("stereo resample is per-channel on interleaved samples") {
    val a = Audio(2, 8000, Array[Short](0, 1000, 100, 2000, 200, 3000))
    val r = WavCodec.resampleLinear(a, 4000)
    assert(r.channels == 2)
    assert(r.samples.toSeq == Seq[Short](0, 1000, 200, 3000))
  }

  test("identity rate returns the same object; short input fails loudly") {
    val a = mono(8000, 1, 2)
    assert(WavCodec.resampleLinear(a, 8000) eq a)
    assertThrows[IllegalArgumentException](
      WavCodec.resampleLinear(mono(8000, 7), 4000))
  }
}
