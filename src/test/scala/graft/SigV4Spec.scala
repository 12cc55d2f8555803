package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.SigV4
import org.scalatest.funsuite.AnyFunSuite

/** [[SigV4]] against the published AWS test vectors — the worked
  * example in the AWS General Reference "Signature Version 4 signing
  * process" documentation (the IAM ListUsers request), byte-for-byte
  * at every intermediate step, fully offline. */
class SigV4Spec extends AnyFunSuite {

  private val creds = SigV4.Credentials(
    "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")

  test("signing-key derivation matches the published AWS example") {
    val key = SigV4.signingKey(creds.secretKey, "20150830",
      "us-east-1", "iam")
    assert(key.map(b => f"${b & 0xff}%02x").mkString ===
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("empty-payload hash is the well-known sha256 of zero bytes") {
    assert(SigV4.sha256Hex(Array.emptyByteArray) ===
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("uriEncode is RFC3986-strict") {
    assert(SigV4.uriEncode("a-b_c.d~e") === "a-b_c.d~e")
    assert(SigV4.uriEncode("a b+c/d") === "a%20b%2Bc%2Fd")
    assert(SigV4.uriEncode("a/b", keepSlash = true) === "a/b")
    assert(SigV4.uriEncode("é") === "%C3%A9") // UTF-8 bytes, uppercase hex
  }

  test("canonical headers: lowercase, trimall, sorted") {
    val (block, names) = SigV4.canonicalHeaders(Seq(
      "X-Amz-Date" -> "20150830T123600Z",
      "Host" -> " iam.amazonaws.com ",
      "Content-Type" -> "application/x-www-form-urlencoded;  charset=utf-8"))
    assert(names === "content-type;host;x-amz-date")
    assert(block ===
      "content-type:application/x-www-form-urlencoded; charset=utf-8\n" +
        "host:iam.amazonaws.com\n" +
        "x-amz-date:20150830T123600Z\n")
  }

  test("canonical headers: repeated names merge to one comma-joined line") {
    // SigV4 multi-value rule: a repeated header canonicalizes as ONE
    // name with values comma-joined in as-sent order — two `k:v`
    // lines / a `k;k` signed list is a request AWS rejects
    val (block, names) = SigV4.canonicalHeaders(Seq(
      "X-Amz-Date" -> "20150830T123600Z",
      "My-Header"  -> " a  b ",
      "Host"       -> "iam.amazonaws.com",
      "my-header"  -> "c"))
    assert(names === "host;my-header;x-amz-date")
    assert(block ===
      "host:iam.amazonaws.com\n" +
        "my-header:a b,c\n" +
        "x-amz-date:20150830T123600Z\n")
  }

  test("full Authorization header matches the published AWS example") {
    // GET https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08
    // at 20150830T123600Z with an empty payload
    val auth = SigV4.authorization(
      creds, "GET", "/",
      Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      Seq(
        "host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "x-amz-date" -> "20150830T123600Z"),
      Array.emptyByteArray,
      amzDate = "20150830T123600Z", region = "us-east-1", service = "iam")
    assert(auth ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/" +
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e0" +
        "6b5924a6f2b5d7")
  }

  test("signedPostHeaders: host signed but not returned, token rides when present") {
    val uri = java.net.URI.create("http://127.0.0.1:8443/path")
    val body = """{"DeliveryStreamName":"s"}""".getBytes(UTF_8)
    val hs = SigV4.signedPostHeaders(
      creds.copy(sessionToken = Some("tok")), uri, body,
      "20150830T123600Z", "us-east-1", "firehose",
      Seq("content-type" -> "application/x-amz-json-1.1"))
    val names = hs.map(_._1)
    assert(!names.contains("host")) // java.net.http forbids explicit Host
    assert(names.contains("x-amz-date") && names.contains("authorization"))
    assert(names.contains("x-amz-security-token"))
    val auth = hs.find(_._1 == "authorization").get._2
    // host:port is in the SIGNED set even though the client sends it
    assert(auth.contains(
      "SignedHeaders=content-type;host;x-amz-date;x-amz-security-token"))
    assert(auth.contains(
      "Credential=AKIDEXAMPLE/20150830/us-east-1/firehose/aws4_request"))
  }

  test("amzDate formats in ISO-8601 basic UTC") {
    assert(SigV4.amzDate(java.time.Instant.parse("2015-08-30T12:36:00Z"))
      === "20150830T123600Z")
  }

  test("signedPostHeaders canonicalizes an endpoint query string into the signature") {
    val body = "b".getBytes(UTF_8)
    val plain = java.net.URI.create("http://h:1/p")
    val withQ = java.net.URI.create("http://h:1/p?Version=2015-08-04&Action=Put")
    def auth(u: java.net.URI) = SigV4.signedPostHeaders(creds, u, body,
      "20260814T000000Z", "us-east-1", "firehose", Nil)
      .find(_._1 == "authorization").get._2
    // a query changes the canonical request, so it must change the
    // signature — signing the bare path for a query-carrying endpoint
    // would be rejected by AWS
    assert(auth(plain) !== auth(withQ))
    // sorted-pair canonicalization: parameter order in the URI is
    // irrelevant
    val reordered = java.net.URI.create("http://h:1/p?Action=Put&Version=2015-08-04")
    assert(auth(withQ) === auth(reordered))
    // percent-encoded values decode then strictly re-encode: %20 in
    // the URI and the literal-space pair canonicalize identically
    val enc = java.net.URI.create("http://h:1/p?k=a%20b")
    val expected = SigV4.canonicalQuery(Seq("k" -> "a b"))
    assert(expected === "k=a%20b")
    assert(auth(enc) !== auth(plain)) // and it participates in signing
  }

  test("signedPostHeaders signs the Host the client actually sends: scheme-default ports stripped, raw path double-encoded") {
    val body = "b".getBytes(UTF_8)
    def auth(u: String) = SigV4.signedPostHeaders(creds,
      java.net.URI.create(u), body, "20260814T000000Z", "us-east-1",
      "firehose", Nil).find(_._1 == "authorization").get._2
    // JDK HttpClient strips an explicit scheme-default port from the
    // wire Host header, so the signature must do the same — an
    // explicit :443 on https (or :80 on http) signs identically to no
    // port at all
    assert(auth("https://h/p") === auth("https://h:443/p"))
    assert(auth("https://h/p") === auth("HTTPS://h:443/p")) // scheme case-blind
    assert(auth("http://h/p") === auth("http://h:80/p"))
    // a NON-default port stays in the signed Host
    assert(auth("http://h/p") !== auth("http://h:8080/p"))
    // the raw (as-sent) path is what gets the second encode: a path
    // with a percent-triplet signs differently from its decoded twin
    // single-encoded (AWS double-encode rule for non-S3 services)
    assert(auth("https://h/a%20b") !== auth("https://h/a-b"))
    val viaRaw = SigV4.authorization(creds, "POST", "/a%20b", Nil,
      Seq("host" -> "h", "x-amz-date" -> "20260814T000000Z"), body,
      "20260814T000000Z", "us-east-1", "firehose")
    val viaDecoded = SigV4.authorization(creds, "POST", "/a b", Nil,
      Seq("host" -> "h", "x-amz-date" -> "20260814T000000Z"), body,
      "20260814T000000Z", "us-east-1", "firehose")
    assert(viaRaw !== viaDecoded) // %20 literally re-encodes to %2520
    assert(auth("https://h/a%20b").endsWith(
      viaRaw.split("Signature=")(1)))
  }

  test("canonicalization invariance: header order and case never change the signature") {
    val body = "payload".getBytes(UTF_8)
    val headers = Seq(
      "Host" -> "example.com",
      "X-Amz-Date" -> "20260814T000000Z",
      "Content-Type" -> "application/x-amz-json-1.1",
      "X-Amz-Target" -> "Firehose_20150804.PutRecordBatch")
    val base = SigV4.authorization(creds, "POST", "/", Nil, headers, body,
      "20260814T000000Z", "us-east-1", "firehose")
    // every permutation and a case-mangled variant sign identically
    headers.permutations.take(12).foreach { perm =>
      assert(SigV4.authorization(creds, "POST", "/", Nil, perm, body,
        "20260814T000000Z", "us-east-1", "firehose") === base)
    }
    val mangled = headers.map { case (k, v) => (k.toUpperCase, v) }
    assert(SigV4.authorization(creds, "POST", "/", Nil, mangled, body,
      "20260814T000000Z", "us-east-1", "firehose") === base)
    // query pairs sort by encoded name then value, order-independent
    val q1 = Seq("b" -> "2", "a" -> "1", "a" -> "0")
    val q2 = Seq("a" -> "0", "a" -> "1", "b" -> "2")
    assert(SigV4.canonicalQuery(q1) === SigV4.canonicalQuery(q2))
    assert(SigV4.canonicalQuery(q1) === "a=0&a=1&b=2")
    // and the signature is sensitive to what it must cover
    assert(SigV4.authorization(creds, "POST", "/", Nil, headers,
      "payload2".getBytes(UTF_8), "20260814T000000Z", "us-east-1",
      "firehose") !== base)
  }
}
