package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing, dependency-free (VERDICT
  * r13 #3). The reference signs implicitly through boto3
  * (spool.py:150-211 `put_record_batch`; init.py:57-68 `--region`/
  * `--profile` select the credential chain and endpoint); this is the
  * same published algorithm — the AWS General Reference "Signature
  * Version 4 signing process" — as ~100 lines of JDK crypto, so
  * [[HttpTransport]] can talk to a REAL Firehose endpoint instead of
  * only the unsigned stub server.
  *
  * Algorithm (all published):
  *   1. canonical request  = method \n uri \n query \n headers \n
  *                           signedHeaderNames \n hex(sha256(payload))
  *   2. string to sign     = "AWS4-HMAC-SHA256" \n amzDate \n scope \n
  *                           hex(sha256(canonicalRequest))
  *      where scope        = date/region/service/aws4_request
  *   3. signing key        = HMAC-chain("AWS4"+secret, date, region,
  *                           service, "aws4_request")
  *   4. signature          = hex(hmac(signingKey, stringToSign))
  *
  * Verified offline in SigV4Spec against the published AWS test
  * vectors (the `get-vanilla-query` / IAM ListUsers example from the
  * signing-process documentation: known signing key bytes, known
  * canonical-request hash, known final Authorization header,
  * byte-for-byte).
  *
  * Everything here is pure (the caller supplies the timestamp), so
  * signing is deterministic and executor-side safe: no clock, no
  * global state, nothing to serialize but two credential strings.
  */
object SigV4 {

  final case class Credentials(accessKeyId: String, secretKey: String,
                               sessionToken: Option[String] = None)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  def sha256Hex(data: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(data))

  /** Step-3 key derivation: HMAC chain from "AWS4"+secret through
    * date, region, service, to the literal "aws4_request". */
  def signingKey(secret: String, date: String, region: String,
                 service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secret).getBytes(UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  /** RFC 3986 strict percent-encoding (the SigV4 `UriEncode`):
    * unreserved chars pass, everything else — including '+' and
    * space — becomes uppercase %XX on the UTF-8 bytes. Slash is
    * encoded unless `keepSlash` (path segments keep theirs). */
  def uriEncode(s: String, keepSlash: Boolean = false): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' ||
          c == '.' || c == '~' || (c == '/' && keepSlash)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical query string: each name/value uriEncoded, pairs sorted
    * by encoded name then encoded value, joined with '&'. */
  def canonicalQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) => (uriEncode(k), uriEncode(v)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Canonical headers: names lowercased, values trimmed with inner
    * runs of spaces collapsed (the spec's `Trimall`), repeated names
    * merged into ONE canonical line with values comma-joined in
    * as-sent order (the spec's multi-value rule — without the merge a
    * duplicated header yields two `k:v` lines and a `k;k` signed
    * list, which AWS rejects), sorted by name.
    * Returns (canonicalHeadersBlock, signedHeaderNames). */
  def canonicalHeaders(headers: Seq[(String, String)]): (String, String) = {
    val canon = headers
      .map { case (k, v) =>
        (k.toLowerCase(java.util.Locale.ROOT),
          v.trim.replaceAll(" +", " "))
      }
      .groupBy(_._1)
      .map { case (k, kvs) => (k, kvs.map(_._2).mkString(",")) }
      .toSeq
      .sortBy(_._1)
    (canon.map { case (k, v) => s"$k:$v\n" }.mkString,
      canon.map(_._1).mkString(";"))
  }

  /** Steps 1-4 in one call: the value for the `Authorization` header.
    *
    * @param path    the AS-SENT (raw) request path; it is URI-encoded
    *                once more here, which together with the wire's own
    *                encoding realizes AWS's non-S3 double-encode rule
    *                ("/" and plain ASCII paths are fixed points)
    * @param amzDate ISO-8601 basic format `yyyyMMdd'T'HHmmss'Z'` —
    *                the SAME string must be sent as `X-Amz-Date`
    * @param headers every header to be signed (must include `host`
    *                and `x-amz-date`; order and case are free — they
    *                are canonicalized here)
    */
  def authorization(creds: Credentials, method: String, path: String,
                    query: Seq[(String, String)],
                    headers: Seq[(String, String)],
                    payload: Array[Byte],
                    amzDate: String, region: String,
                    service: String): String = {
    val (headerBlock, signedNames) = canonicalHeaders(headers)
    val canonicalRequest = Seq(
      method,
      if (path.isEmpty) "/" else uriEncode(path, keepSlash = true),
      canonicalQuery(query),
      headerBlock,
      signedNames,
      sha256Hex(payload)).mkString("\n")
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq(
      "AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val signature = hex(hmac(signingKey(creds.secretKey, date, region,
      service), stringToSign))
    s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
      s"SignedHeaders=$signedNames, Signature=$signature"
  }

  /** The endpoint's own query string as decoded (name, value) pairs
    * for canonicalization. `getRawQuery` keeps percent-triplets so a
    * decode→re-encode round trip is exact; a literal '+' is protected
    * first because URLDecoder speaks form-encoding where '+' means
    * space, while RFC 3986 (what a URI carries) leaves '+' literal. */
  private def queryPairs(uri: java.net.URI): Seq[(String, String)] =
    Option(uri.getRawQuery).filter(_.nonEmpty).toSeq.flatMap(_.split("&"))
      .filter(_.nonEmpty)
      .map { pair =>
        def dec(s: String) = java.net.URLDecoder.decode(
          s.replace("+", "%2B"), UTF_8)
        pair.split("=", 2) match {
          case Array(k, v) => (dec(k), dec(v))
          case Array(k) => (dec(k), "")
        }
      }

  /** The complete header set for a signed POST with a body: the
    * caller sends exactly these plus whatever unsigned extras it
    * wants. `host` is signed but NOT returned (java.net.http sets it
    * itself and forbids explicit Host headers); the client's value is
    * identical by construction — both derive from the same URI. A
    * query string on the endpoint URI is canonicalized into the
    * signature (the client sends the URI verbatim, so signed and sent
    * queries agree). */
  def signedPostHeaders(creds: Credentials, uri: java.net.URI,
                        body: Array[Byte], amzDate: String,
                        region: String, service: String,
                        extraSigned: Seq[(String, String)]): Seq[(String, String)] = {
    // sign the Host value the CLIENT will actually send: JDK
    // HttpClient strips a scheme-default port (an explicit ":443" on
    // https never reaches the wire), so signing host:443 would make
    // AWS canonicalize a different request and 403 every batch
    // scheme compare is case-insensitive, like the JDK client's own
    // default-port logic ("HTTPS://..." must strip :443 too)
    val defaultPort =
      Option(uri.getScheme).map(_.toLowerCase(java.util.Locale.ROOT)) match {
        case Some("https") => 443
        case Some("http") => 80
        case _ => -1
      }
    val host =
      if (uri.getPort == -1 || uri.getPort == defaultPort) uri.getHost
      else s"${uri.getHost}:${uri.getPort}"
    val tokenHeader =
      creds.sessionToken.map(t => "x-amz-security-token" -> t).toSeq
    val signed = Seq("host" -> host, "x-amz-date" -> amzDate) ++
      tokenHeader ++ extraSigned
    // the RAW (as-sent) path: AWS's non-S3 canonical URI rule encodes
    // each path segment TWICE — the wire carries the once-encoded
    // form, and authorization() applies the second encode. Passing
    // the decoded getPath here would sign the single-encoded form and
    // mismatch on any path with reserved/encoded characters.
    val path = Option(uri.getRawPath).getOrElse("")
    val auth = authorization(creds, "POST", path, queryPairs(uri), signed,
      body, amzDate, region, service)
    (signed.filterNot(_._1 == "host") :+ ("authorization" -> auth))
  }

  /** `yyyyMMdd'T'HHmmss'Z'` for an instant — the X-Amz-Date format. */
  def amzDate(instant: java.time.Instant): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(instant)
}
