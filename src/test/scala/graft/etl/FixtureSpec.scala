package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins `fixtures/u_item_utf8.csv` (the DuckDB-readable oracle input for
  * q40/q42/q43 — DuckDB 1.0 can't decode ISO-8859-1) byte-for-byte to a
  * fresh transcode of the reference's `u.item`. If the fixture drifts from
  * the reference data, the ML oracles silently verify the wrong expected
  * values; this spec makes that loud.
  */
class FixtureSpec extends AnyFunSuite {

  test("u_item_utf8.csv is exactly the ISO-8859-1 -> UTF-8 transcode of u.item") {
    val raw = Files.readAllBytes(Paths.get("/root/reference/data/u.item"))
    val transcoded =
      new String(raw, StandardCharsets.ISO_8859_1).getBytes(StandardCharsets.UTF_8)
    val fixture = Files.readAllBytes(Paths.get("/root/repo/fixtures/u_item_utf8.csv"))
    assert(fixture.sameElements(transcoded),
      "fixtures/u_item_utf8.csv is stale — regenerate with " +
        "`iconv -f ISO-8859-1 -t UTF-8 /root/reference/data/u.item`")
  }
}
