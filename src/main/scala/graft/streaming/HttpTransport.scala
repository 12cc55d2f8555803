package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

/** [[BatchTransport]] over the Firehose REST wire (SURVEY §2 #87/#53;
  * reference spool.py:150-211 — boto3 `put_record_batch` — and
  * init.py:57-68 `--region`/`--profile` selecting the endpoint).
  * The reference's call is ONE HTTPS POST per batch in the
  * `Firehose_20150804.PutRecordBatch` shape; this implementation
  * speaks that exact shape to any HTTP endpoint:
  *
  *   POST {endpoint}
  *     Content-Type: application/x-amz-json-1.1
  *     X-Amz-Target: Firehose_20150804.PutRecordBatch
  *     {"DeliveryStreamName": dest,
  *      "Records": [{"Data": "<base64 spool-file bytes>"}, ...]}
  *   ← {"FailedPutCount": n,
  *      "RequestResponses": [{"RecordId": "..."} |
  *                           {"ErrorCode": "...", "ErrorMessage": "..."}]}
  *
  * Per-record outcome i is `RequestResponses[i]` carrying a RecordId
  * (success) vs an ErrorCode (failure) — the same field test the
  * reference applies (spool.py:199-203). A transport-level failure
  * (connect refused, non-200, malformed/short response) fails the
  * WHOLE batch: every record reports false and re-enters the retry
  * spool, the drain-architecture analogue of the reference's
  * catch-and-return that leaves the files spooled for the next flush
  * (spool.py:193-198).
  *
  * Record bytes are read from `spoolDirs` (first directory containing
  * the part name wins — the main spool and the retry spool are
  * separate directories sharing one transport). With `signing`
  * (credentials + region), each request carries `X-Amz-Date` and a
  * SigV4 `Authorization` header computed by [[SigV4]] — the same
  * signature boto3 attaches for the reference — making the transport
  * production-complete against a real Firehose endpoint; without it,
  * the unsigned path serves the spec's stub server unchanged.
  *
  * Idempotency: Firehose itself has no dedupe key, so replays can
  * double-deliver there (true of the reference too). The drain's
  * `attempt` rides in `X-Graft-Attempt`/`X-Graft-Batch` headers so an
  * endpoint that CAN dedupe (the stub server in the specs, or a
  * smarter proxy) has the (dest, attempt, batchId) identity the
  * [[BatchTransport]] contract names.
  */
class HttpTransport(endpoint: String, spoolDirs: Seq[String],
                    connectTimeoutMs: Int = 5000,
                    requestTimeoutMs: Int = 30000,
                    signing: Option[(SigV4.Credentials, String)] = None,
                    clock: () => java.time.Instant =
                      () => java.time.Instant.now()) extends BatchTransport {

  // executors each build their own client/mapper; neither serializes
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  private def findPart(partId: String): Option[Path] =
    spoolDirs.iterator.map(d => Paths.get(d, partId)).find(Files.isRegularFile(_))

  override def ship(dest: String, batchId: Long, attempt: String,
                    records: Seq[ShipRecord]): Seq[Boolean] = {
    val allFailed = records.map(_ => false)
    try {
      // a missing part file is a batch-level fault (the batch's record
      // indices would no longer align with the request we can build),
      // and so is a part deleted between findPart and the read — the
      // IOException lands in the same catch and the batch re-spools
      val parts = records.map(r => findPart(r.partId))
      if (parts.exists(_.isEmpty)) return allFailed
      val body = mapper.createObjectNode()
      body.put("DeliveryStreamName", dest)
      val arr = body.putArray("Records")
      parts.flatten.foreach { p =>
        arr.addObject().put("Data",
          Base64.getEncoder.encodeToString(Files.readAllBytes(p)))
      }
      val uri = URI.create(endpoint)
      val bodyBytes = mapper.writeValueAsString(body)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val builder = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
        .header("X-Graft-Attempt", attempt)
        .header("X-Graft-Batch", batchId.toString)
        .POST(HttpRequest.BodyPublishers.ofByteArray(bodyBytes))
      // content-type and x-amz-target are part of the signature when
      // signing (AWS signs them for this API); sent either way
      val apiHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "Firehose_20150804.PutRecordBatch")
      val headers = signing match {
        case Some((creds, region)) =>
          SigV4.signedPostHeaders(creds, uri, bodyBytes,
            SigV4.amzDate(clock()), region, "firehose", apiHeaders)
        case None => apiHeaders
      }
      headers.foreach { case (k, v) => builder.header(k, v) }
      val req = builder.build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) return allFailed
      val root = mapper.readTree(resp.body())
      val rrs = root.get("RequestResponses")
      if (rrs == null || !rrs.isArray || rrs.size() != records.length)
        return allFailed
      (0 until rrs.size()).map(i => rrs.get(i).hasNonNull("RecordId"))
    } catch {
      case _: java.io.IOException => allFailed
      case _: InterruptedException =>
        // re-assert the interrupt: Spark task kill relies on the flag,
        // and a drain that swallowed it would keep shipping batches
        Thread.currentThread().interrupt()
        allFailed
    }
  }
}
