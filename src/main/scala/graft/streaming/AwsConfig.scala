package graft.streaming

/** AWS client-side configuration resolution — the seam the reference
  * relay gets for free from boto3 (init.py:57-68: `--profile` selects
  * a shared-credentials-file profile, `--region` alone resolves the
  * Firehose endpoint). Everything here implements PUBLIC, AWS-
  * documented behavior: the shared credentials file format
  * (`~/.aws/credentials`, INI sections of aws_access_key_id /
  * aws_secret_access_key / aws_session_token), the
  * `AWS_SHARED_CREDENTIALS_FILE` override, the standard credential
  * precedence (explicit profile → file only; otherwise env vars, then
  * the file's [default]), the `AWS_ENDPOINT_URL[_FIREHOSE]` endpoint
  * overrides, and the public `https://firehose.{region}.amazonaws.com`
  * endpoint pattern.
  *
  * All functions take the environment as an explicit Map so specs
  * exercise the chain without mutating process env; [[graft.tools.RelayMain]]
  * passes `sys.env`. The chain deliberately stops at the file — an
  * instance-metadata/STS hop is a network client with its own retry
  * and expiry semantics, out of scope for a zero-egress library (the
  * error message says so rather than failing mysteriously).
  */
object AwsConfig {

  /** Minimal INI parser for the shared credentials file: `[section]`
    * headers, `key = value` lines, `#`/`;` comment lines, surrounding
    * whitespace trimmed, keys lowercased, later duplicates win
    * (configparser behavior). Lines outside any section or without
    * '=' are ignored. */
  def parseIni(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var section: Option[String] = None
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1).trim
          section = Some(name)
          out.getOrElseUpdate(name,
            scala.collection.mutable.LinkedHashMap.empty)
        } else {
          val i = line.indexOf('=')
          if (i > 0) section.foreach { s =>
            out(s).update(
              line.take(i).trim.toLowerCase(java.util.Locale.ROOT),
              line.drop(i + 1).trim)
          }
        }
      }
    }
    out.map { case (k, v) => (k, v.toMap) }.toMap
  }

  /** Shared-credentials-file location: `AWS_SHARED_CREDENTIALS_FILE`
    * else `~/.aws/credentials`. */
  def credentialsPath(env: Map[String, String]): java.nio.file.Path =
    java.nio.file.Paths.get(env.getOrElse("AWS_SHARED_CREDENTIALS_FILE",
      s"${System.getProperty("user.home")}/.aws/credentials"))

  /** Credential resolution: an EXPLICIT profile reads the shared file
    * only (passing `--profile` tells boto3 to skip env credentials);
    * otherwise `AWS_ACCESS_KEY_ID`/`AWS_SECRET_ACCESS_KEY` win, then
    * the file's `[default]`. Left = a message naming every source
    * consulted, so "no credentials" is actionable. */
  def resolveCredentials(env: Map[String, String],
                         profile: Option[String]): Either[String, SigV4.Credentials] = {
    def fromFile(name: String): Either[String, SigV4.Credentials] = {
      val path = credentialsPath(env)
      if (!java.nio.file.Files.isReadable(path))
        Left(s"credentials file $path not readable (wanted profile '$name')")
      else {
        val ini = parseIni(java.nio.file.Files.readString(path))
        ini.get(name) match {
          case None => Left(s"profile '$name' not found in $path " +
            s"(has: ${ini.keys.mkString(", ")})")
          case Some(kv) =>
            (kv.get("aws_access_key_id"), kv.get("aws_secret_access_key")) match {
              case (Some(a), Some(s)) =>
                Right(SigV4.Credentials(a, s, kv.get("aws_session_token")))
              case _ => Left(s"profile '$name' in $path is missing " +
                "aws_access_key_id/aws_secret_access_key")
            }
        }
      }
    }
    profile match {
      case Some(name) => fromFile(name)
      case None =>
        // empty-string env values count as unset (botocore's
        // EnvProvider rule — `export AWS_ACCESS_KEY_ID=""` is a
        // common way to deactivate env credentials and must fall
        // through to the shared file)
        (env.get("AWS_ACCESS_KEY_ID").filter(_.nonEmpty),
          env.get("AWS_SECRET_ACCESS_KEY").filter(_.nonEmpty)) match {
          case (Some(a), Some(s)) =>
            Right(SigV4.Credentials(a, s,
              env.get("AWS_SESSION_TOKEN").filter(_.nonEmpty)))
          // half a credential pair is a configuration MISTAKE, not an
          // absence — falling through to the file would sign with a
          // different account's keys (botocore raises
          // PartialCredentialsError here)
          case (Some(_), None) => Left("partial env credentials: " +
            "AWS_ACCESS_KEY_ID is set but AWS_SECRET_ACCESS_KEY is " +
            "unset or empty")
          case (None, Some(_)) => Left("partial env credentials: " +
            "AWS_SECRET_ACCESS_KEY is set but AWS_ACCESS_KEY_ID is " +
            "unset or empty")
          case (None, None) => fromFile("default").left.map(e =>
            "no credentials: AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY env " +
              "vars unset and " + e +
              " (supported sources: env vars, shared credentials file; " +
              "instance-role metadata is out of scope for this library)")
        }
    }
  }

  /** Firehose endpoint for a region: the AWS-documented endpoint
    * override env vars first (service-specific beats global), else
    * the public regional endpoint boto3 derives. */
  def firehoseEndpoint(region: String, env: Map[String, String]): String =
    env.get("AWS_ENDPOINT_URL_FIREHOSE")
      .orElse(env.get("AWS_ENDPOINT_URL"))
      .getOrElse(s"https://firehose.$region.amazonaws.com")
}
