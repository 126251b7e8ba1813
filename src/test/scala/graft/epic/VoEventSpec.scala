package graft.epic

import java.nio.file.Files

import graft.SparkSpec

class VoEventSpec extends SparkSpec {

  /** A realistic namespaced VOEvent 2.0 document (shape per the public
    * IVOA standard; values chosen inside this engine's validation range). */
  private val grbEvent =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<voe:VOEvent xmlns:voe="http://www.ivoa.net/xml/VOEvent/v2.0"
      |             ivorn="ivo://test.obs/alerts#GRB_220831A"
      |             role="observation" version="2.0">
      |  <Who><Date>2022-08-31T23:29:10</Date></Who>
      |  <What><Param name="SNR" value="12.5"/></What>
      |  <WhereWhen>
      |    <ObsDataLocation>
      |      <ObservationLocation>
      |        <AstroCoords coord_system_id="UTC-ICRS-TOPO">
      |          <Time unit="s"><TimeInstant>
      |            <ISOTime>2022-08-31T23:29:10.000</ISOTime>
      |          </TimeInstant></Time>
      |          <Position2D unit="deg">
      |            <Name1>RA</Name1><Name2>Dec</Name2>
      |            <Value2><C1>180.0</C1><C2>34.0</C2></Value2>
      |            <Error2Radius>0.05</Error2Radius>
      |          </Position2D>
      |        </AstroCoords>
      |      </ObservationLocation>
      |    </ObsDataLocation>
      |  </WhereWhen>
      |  <Why importance="0.9">
      |    <Inference probability="0.9">
      |      <Name>GRB 220831A</Name>
      |      <Concept>process.variation.burst</Concept>
      |    </Inference>
      |  </Why>
      |</voe:VOEvent>""".stripMargin

  test("parses the standard fields from a namespaced VOEvent 2.0") {
    val v = VoEvent.parse(grbEvent)
    assert(v.name == "GRB 220831A")
    assert(v.ra == 180.0 && v.dec == 34.0)
    assert(v.isoTime == "2022-08-31T23:29:10.000")
    assert(v.concept == "process.variation.burst")
    assert(v.ivorn == "ivo://test.obs/alerts#GRB_220831A")
  }

  test("name falls back to the ivorn local part when Why/Name is absent") {
    val noWhy = grbEvent.replaceAll("(?s)<Why.*</Why>", "")
    assert(VoEvent.parse(noWhy).name == "GRB_220831A")
  }

  test("addVoeventWatch registers a watch with the event's position") {
    val store = new WatchStore(spark,
      Files.createTempDirectory("voe").toString + "/wl")
    val id = store.addVoeventWatch(grbEvent)
    assert(id == 1L)
    val row = store.listAll().collect().head
    assert(row.getAs[String]("source_name") == "GRB 220831A")
    assert(row.getAs[Double]("ra") == 180.0)
    assert(row.getAs[Double]("dec") == 34.0)
    assert(row.getAs[String]("event_type") == "process.variation.burst")
    assert(row.getAs[String]("voevent").contains("ivo://test.obs/alerts"))
    // it is a real watch: visible on the active watchlist
    assert(store.watchlist().count() == 1)
  }

  test("rejects events without a position, non-VOEvent XML, and DOCTYPEs") {
    intercept[IllegalArgumentException] {
      VoEvent.parse(grbEvent.replaceAll("(?s)<WhereWhen>.*</WhereWhen>", ""))
    }
    intercept[IllegalArgumentException] {
      VoEvent.parse("<NotAnEvent/>")
    }
    // XXE hardening: doctype declarations are refused outright
    intercept[Exception] {
      VoEvent.parse("<?xml version=\"1.0\"?><!DOCTYPE VOEvent [" +
        "<!ENTITY x SYSTEM \"file:///etc/passwd\">]><VOEvent/>")
    }
  }
}
