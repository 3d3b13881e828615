package graft.operators

/** REAL-interop zstd dictionary fixtures, embedded the way
  * WebpCodecSpec embeds real libwebp streams: the dictionary was
  * trained by the system Zstandard CLI (v1.5.7, `zstd --train` over
  * 120 deterministic synthetic SQL-shaped samples, --maxdict=2048) and
  * the two frames were compressed by the same CLI at -19 with `-D`.
  * Decoding them correctly therefore proves interop with the
  * reference implementation's dictionary format (RFC 8878 S5), not
  * just self-consistency. The plaintexts are reconstructed in code /
  * SQL (P1 verbatim; P2 = "SELECT " + 40 space-joined repeats of
  * "shuffle partition broadcast" + " FROM orders;").
  */
object ZstdDictData {

  val P1Text: String =
    "SELECT broadcast partition shuffle aggregate FROM lineitem WHERE " +
      "predicate pushdown codegen window bucket salt skew exchange " +
      "parquet catalyst orders;"

  val P2Text: String =
    "SELECT " + Seq.fill(40)("shuffle partition broadcast").mkString(" ") +
      " FROM orders;"

  val DictB64: String =
    "N6Qw7P95+n8aENhB0wEMwzAMw0yvJ9iRsMtO9u62u3W1ZB4zAABAYKjwoFY42gAABMAAA4cP" +
    "a+a8FomDJYqiM8YAQgAAAAAAAAAAAAAAAAAA5B0AAAAAAAAAAAAAAAAAAAAAAQAAAAQAAAAI" +
    "AAAAaHVmZmxlIHdpbmRvdyBwcmVkaWNhdGUgYWdncmVnYXRlIHNodWZmbGUgY29kZWdlbiBw" +
    "cmVkaWNhdGUgcHJlZGljYXRlIHNrZXcgZXhjaGFuZ2UgRlJPTSB0NzQ7U0VMRUNUIHByZWRp" +
    "Y2F0ZSBzaHVmZmxlIG9yZGVycyBza2V3IGNhdGFseXN0IGFnZ3JlZ2F0ZSBsaW5laXRlbSBz" +
    "YWx0IHNrZXcgYWdncmVnYXRlIHBhcnF1ZXQgc2FsdCBhZ2dyZWdhdGUgY29kZWdlbiBidWNr" +
    "ZXQgc2h1ZmZsZSBjYXRhbHlzdCBidWNrZXQgd2luZG93IGJyb2FkY2FzdCBjb2RlZ2VuIGV4" +
    "Y2hhbmdlIGV4Y2hhbmdlIHdpbmRvdyBza2V3IGV4Y2hhbmdlIGJyb2FkY2FzdCBjb2RlZ2Vu" +
    "IGNhdGFseXN0IHByZWRpY2F0ZSBwYXJ0aXRpb24gb3JkZXJzIGJyb2FkY2FzdCB3aW5kb3cg" +
    "YnVja2V0IHNodWZmbGUgc2tldyBzYWx0IGFnZ3JlZ2F0ZSBleGNoYW5nZSBleGNoYW5nZSBi" +
    "dWNrZXQgYWdzIGxpbmVpdGVtIGV4Y2hhbmdlIHB1c2hkb3duIHBhcnRpdGlvbiBleGNoYW5n" +
    "ZSBjb2RlZ2VuIGJ1Y2tldCBwdXNoZG93biBicm9hZGNhc3QgY2F0YWx5c3QgZXhjaGFuZ2Ug" +
    "c2tldyBwYXJxdWV0IGJyb2FkY2FzdCBsaW5laXRlbSBjb2RlZ2VuIGJyb2FkY2FzdCBzYWx0" +
    "IHBhcnRpdGlvbiBzaHVmZmxlIGJyb2FkY2FzdCBwcmVkaWNhdGUgd2luZG93IHByZWRpY2F0" +
    "ZSBsaW5laXRlbSBvcmRlcnMgZXhjaGFuZ2Ugc2FsdCBza2V3IGNvZGVnZW4gcGFycXVldCBs" +
    "aW5laXRlbSBvcmRlcnMgb3JkZXJzIGxpbmVpdGVtIHdpbmRvdyBwYXJxdWV0IGNvZGVnZW4g" +
    "RlJPTSB0Mjg7U0VMRUNUIHByZWRpY2F0ZSBicm9hZGNhc3QgcHVzaGRvd24gcHVzaGRvd24g" +
    "c2h1ZmZsZSBhZ2dyZWdhdGUgbGluZWl0ZW0gc2tldyBjb2RlZ2VuIHBhcnF1ZXQgYWdncmVn" +
    "YXRlIHNhbHQgY2F0YWx5c3Qgb3JkZXJzIGNhdGFseXN0IGV4Y2hhbmdlIG9yZGVycyBzYWx0" +
    "IHBhcnF1ZXQgYnVja2V0IGJyb2FkY2FzdCBwdXNoZG93biBsaW5laXRlbSBwYXJ0aXRpb24g" +
    "YnJvYWRuIHB1c2hkb3duIHB1c2hkb3duIGJyb2FkY2FzdCBza2V3IGFnZ3JlZ2F0ZSBjYXRh" +
    "bHlzdCBsaW5laXRlbSBzaHVmZmxlIHNodWZmbGUgb3JkZXJzIHBhcnRpdGlvbiBjYXRhbHlz" +
    "dCB3aW5kb3cgc2FsdCBidWNrZXQgY2F0YWx5c3Qgc2h1ZmZsZSBsaW5laXRlbSBvcmRlcnMg" +
    "bGluZWl0ZW0gYnJvYWRjYXN0IGJ1Y2tldCBvcmRlcnMgcGFycXVldCBwdXNoZG93biBzYWx0" +
    "IHByZWRpY2F0ZSBGUk9NIHQ5ODtTRUxFQ1QgZXhjaGFuZ2Ugc2FsdCBza2V3IGNvZGVnZW4g" +
    "YWdncmVnYXRlIG9yZGVycyBzaHVmZmxlIGNvZGVnZW4gc2tldyBjYXRhbHlzdCB3aW5kb3cg" +
    "cGFydGl0aW9uIG9yZGVycyBidWNrZXQgb3JkZXJzIGNvZGVnZW4gcGFycXVldCBhZ2dyZWdh" +
    "dGUgY2F0YWx5c3QgcGFydGl0aW9uIHNodWZmbGUgc2tldyBwcmVkaWNhdGUgc2FsdCBzYWx0" +
    "IGJyb2FkY2FzdCBzaHVmZmxlIHNhbHQgYWdncmVnYXRlIHBhcnRpdGlvbiBjYXRhbHlzdCBw" +
    "cmVkaWNhdGUgZXhjaGFuZ2Ugc2h1ZmZsZSBwYXJ0aXRpb24gc2tldyBza2V3IEZST00gdDEw" +
    "NDsgY2F0YWx5c3Qgc2FsdCBidWNrZXQgcGFycXVldCBhZ2dyZWdhdGUgb3JkZXJzIGJyb2Fk" +
    "Y2FzdCBwcmVkaWNhdGUgc2tldyBidWNrZXQgc2h1ZmZsZSBwcmVkaWNhdGUgd2luZG93IGV4" +
    "Y2hhbmdlIHdpbmRvdyBwdXNoZG93biBwYXJ0aXRpb24gcHJlZGljYXRlIHNhbHQgbGluZWl0" +
    "ZW0gb3JkZXJzIHB1c2hkb3duIGV4Y2hhbmdlIGV4Y2hhbmdlIHByZWRpY2F0ZSBjb2RlZ2Vu" +
    "IHNodWZmbGUgRlJPTSB0OTA7U0VMRUNUIGV4Y2hhbmdlIHBhcnF1ZXQgcGFydGl0aW9uIHNr" +
    "ZXcgb3JkZXJzIGNhdGFseXN0IHB1c2hkb3duIGJyb2FkY2FzdCBjb2RlZ2VuIHdpbmRvdyB3" +
    "aW5kb3cgc2tldyBzaHVmZmxlIHBhcnF1ZXQgc2FsdCB3aW5kb3cgcHJlZGljYXRlIGJyb2Fk" +
    "Y2FzdCBidWNrZXQgcHJlZGljYXRlIGJ1Y2tldCBleGNoYW5nZSB3aW5kb3cgY29kZWc="

  val P1B64: String =
    "KLUv/Sf/efp/lTUBADhTV0hFUkU7DfyzfGQq5xYIPns2faXCIq7Ig8j0IQERq2LBhP8BD1Ia" +
    "wQ=="

  val P2B64: String =
    "KLUv/Wf/efp/cwO1AAAQUzsG8AqdNWVLiMefhrU7GRUxyv8BirVIqQ=="

  def dictBytes: Array[Byte] = java.util.Base64.getDecoder.decode(DictB64)
  def p1Bytes: Array[Byte] = java.util.Base64.getDecoder.decode(P1B64)
  def p2Bytes: Array[Byte] = java.util.Base64.getDecoder.decode(P2B64)
}
