package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AwsConfig

/** Credential-chain + endpoint resolution (the reference's
  * init.py:57-68 `--profile`/`--region` seam, which boto3 resolves
  * through the shared credentials file and the public endpoint
  * pattern). */
class AwsConfigSpec extends AnyFunSuite {

  private def tempCreds(text: String): String = {
    val f = Files.createTempFile("graft-aws-creds", ".ini")
    Files.writeString(f, text)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("parseIni: sections, comments, trimming, lowercased keys, later duplicate wins") {
    val ini = AwsConfig.parseIni(
      """ignored = outside any section
        |# comment
        |[default]
        |AWS_ACCESS_KEY_ID = AKID1
        |aws_secret_access_key=sec1
        |; another comment
        |aws_access_key_id = AKID1B
        |
        |[relay]
        |aws_access_key_id = AKID2
        |aws_secret_access_key = sec2
        |aws_session_token = tok2
        |""".stripMargin)
    assert(ini.keySet === Set("default", "relay"))
    assert(ini("default")("aws_access_key_id") === "AKID1B") // duplicate wins
    assert(ini("default")("aws_secret_access_key") === "sec1")
    assert(ini("relay")("aws_session_token") === "tok2")
  }

  test("default chain: env vars win; file [default] is the fallback; empty chain names its sources") {
    val file = tempCreds(
      "[default]\naws_access_key_id = FK\naws_secret_access_key = FS\n")
    val fileEnv = Map("AWS_SHARED_CREDENTIALS_FILE" -> file)
    // env wins over file
    val env = fileEnv ++ Map(
      "AWS_ACCESS_KEY_ID" -> "EK", "AWS_SECRET_ACCESS_KEY" -> "ES",
      "AWS_SESSION_TOKEN" -> "ET")
    val fromEnv = AwsConfig.resolveCredentials(env, None).toOption.get
    assert(fromEnv.accessKeyId === "EK" && fromEnv.sessionToken === Some("ET"))
    // no env -> file [default]
    val fromFile = AwsConfig.resolveCredentials(fileEnv, None).toOption.get
    assert(fromFile.accessKeyId === "FK" && fromFile.sessionToken === None)
    // nothing anywhere -> an error that names every consulted source
    val err = AwsConfig.resolveCredentials(
      Map("AWS_SHARED_CREDENTIALS_FILE" -> "/nonexistent/creds"), None)
      .left.toOption.get
    assert(err.contains("AWS_ACCESS_KEY_ID"))
    assert(err.contains("credentials file"))
    assert(err.contains("supported sources"))
  }

  test("empty-string env credentials count as unset and fall through to the file (botocore EnvProvider rule)") {
    val file = tempCreds(
      "[default]\naws_access_key_id = FK\naws_secret_access_key = FS\n")
    val env = Map("AWS_SHARED_CREDENTIALS_FILE" -> file,
      "AWS_ACCESS_KEY_ID" -> "", "AWS_SECRET_ACCESS_KEY" -> "")
    val creds = AwsConfig.resolveCredentials(env, None).toOption.get
    assert(creds.accessKeyId === "FK", "empty env creds must not win")
    // an empty session token alongside real env keys is dropped too
    val withTok = AwsConfig.resolveCredentials(Map(
      "AWS_ACCESS_KEY_ID" -> "EK", "AWS_SECRET_ACCESS_KEY" -> "ES",
      "AWS_SESSION_TOKEN" -> ""), None).toOption.get
    assert(withTok.accessKeyId === "EK" && withTok.sessionToken === None)
  }

  test("--profile without --region fails loudly instead of shipping unsigned") {
    val e = intercept[RuntimeException] {
      graft.tools.RelayMain.resolveTransport(
        Map("profile" -> List("relay"),
          "endpoint" -> List("http://localhost:1")),
        Map.empty, Seq.empty, "/tmp/unused")
    }
    assert(e.getMessage.contains("--profile requires --region"))
  }

  test("explicit profile reads the file ONLY (boto3 skips env creds for --profile)") {
    val file = tempCreds(
      """[default]
        |aws_access_key_id = DK
        |aws_secret_access_key = DS
        |[relay]
        |aws_access_key_id = PK
        |aws_secret_access_key = PS
        |""".stripMargin)
    val env = Map("AWS_SHARED_CREDENTIALS_FILE" -> file,
      "AWS_ACCESS_KEY_ID" -> "EK", "AWS_SECRET_ACCESS_KEY" -> "ES")
    val creds = AwsConfig.resolveCredentials(env, Some("relay")).toOption.get
    assert(creds.accessKeyId === "PK") // not the env's EK
    // a missing profile is an error listing what IS there
    val err = AwsConfig.resolveCredentials(env, Some("nope")).left.toOption.get
    assert(err.contains("'nope'") && err.contains("relay"))
  }

  test("KINESYSLOG_* env vars fill in missing flags; CLI wins; repeatables split; flags need a truthy value") {
    val W = graft.tools.RelayMain.withEnvDefaults _
    val env = Map(
      "KINESYSLOG_STREAM" -> "env-stream",
      "KINESYSLOG_TCP_PORT" -> "6601 6602",
      "KINESYSLOG_GROUP_PREFIX" -> "/envprefix",
      "KINESYSLOG_GELF" -> "true",
      "KINESYSLOG_PORT_STREAM" -> "6601=audit",
      "UNRELATED" -> "x")
    val filled = W(Map.empty, env)
    assert(filled("stream") === List("env-stream"))
    assert(filled("tcp-port") === List("6601", "6602")) // click's whitespace split
    assert(filled("group-prefix") === List("/envprefix"))
    assert(filled("gelf") === List("true"))
    assert(filled("port-stream") === List("6601=audit"))
    assert(!filled.contains("region"))
    // an explicit flag always beats its env var
    val cli = W(Map("stream" -> List("cli-stream")), env)
    assert(cli("stream") === List("cli-stream"))
    // a falsy or empty flag env var stays off (click BOOL conversion)
    assert(!W(Map.empty, Map("KINESYSLOG_GELF" -> "0")).contains("gelf"))
    assert(!W(Map.empty, Map("KINESYSLOG_GELF" -> "")).contains("gelf"))
    // a single-value option's env value passes through RAW — click
    // only splits multiple=True options, so a path with a space must
    // survive intact
    assert(W(Map.empty, Map("KINESYSLOG_SPOOL_DIR" -> "/var/spool/my relay"))
      .apply("spool-dir") === List("/var/spool/my relay"))
    // an unrecognizable flag value is a startup error, never silent-off
    val bad = intercept[RuntimeException] {
      W(Map.empty, Map("KINESYSLOG_GELF" -> "enabled"))
    }
    assert(bad.getMessage.contains("KINESYSLOG_GELF"))
  }

  test("partial env credentials error out instead of silently signing with the file's keys") {
    val file = tempCreds(
      "[default]\naws_access_key_id = FK\naws_secret_access_key = FS\n")
    val err = AwsConfig.resolveCredentials(Map(
      "AWS_SHARED_CREDENTIALS_FILE" -> file,
      "AWS_ACCESS_KEY_ID" -> "EK"), None).left.toOption.get
    assert(err.contains("partial env credentials"))
    assert(err.contains("AWS_SECRET_ACCESS_KEY"))
    val err2 = AwsConfig.resolveCredentials(Map(
      "AWS_SHARED_CREDENTIALS_FILE" -> file,
      "AWS_SECRET_ACCESS_KEY" -> "ES"), None).left.toOption.get
    assert(err2.contains("AWS_ACCESS_KEY_ID"))
  }

  test("firehose endpoint: region derives the public URL; override env vars win, service-specific first") {
    assert(AwsConfig.firehoseEndpoint("eu-west-1", Map.empty) ===
      "https://firehose.eu-west-1.amazonaws.com")
    assert(AwsConfig.firehoseEndpoint("eu-west-1",
      Map("AWS_ENDPOINT_URL" -> "http://localhost:1")) === "http://localhost:1")
    assert(AwsConfig.firehoseEndpoint("eu-west-1",
      Map("AWS_ENDPOINT_URL" -> "http://localhost:1",
        "AWS_ENDPOINT_URL_FIREHOSE" -> "http://localhost:2")) ===
      "http://localhost:2")
  }
}
