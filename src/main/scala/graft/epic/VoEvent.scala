package graft.epic

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import javax.xml.XMLConstants
import javax.xml.parsers.DocumentBuilderFactory

import org.w3c.dom.{Document, Element}

/** IVOA VOEvent 2.0 intake (C5) — the handler the reference declares but
  * parks (`watch_dog.py:139-142` raises NotImplementedError; the table
  * stores the XML opaquely, `pg_pixel_storage.py:74`). We implement the
  * standard instead of parking it: parse the public VOEvent 2.0 schema
  * (WhereWhen/Position2D for the sky position, Why/Inference for the
  * identity), register the watch, and keep the raw XML in the `voevent`
  * column exactly like the reference's table does.
  *
  * Namespace-agnostic DOM traversal (VOEvent streams mix `voe:` prefixes
  * and default namespaces in the wild), external entities disabled (the
  * XML arrives from outside the trust boundary).
  */
object VoEvent {

  /** The fields a watch needs, straight from the event. */
  case class Parsed(ivorn: String, name: String, ra: Double, dec: Double,
      isoTime: String, concept: String)

  def parse(xml: String): Parsed = {
    val doc = secureBuilder(xml)
    val root = doc.getDocumentElement
    require(root.getLocalName == "VOEvent",
      s"not a VOEvent document: <${root.getTagName}>")
    val ivorn = Option(root.getAttribute("ivorn")).getOrElse("")

    val pos = firstByLocalName(doc, "Position2D").getOrElse(
      throw new IllegalArgumentException(
        "VOEvent has no WhereWhen/Position2D — cannot derive a watch"))
    val c1 = textOf(pos, "C1").getOrElse(
      throw new IllegalArgumentException("Position2D missing C1 (ra)"))
    val c2 = textOf(pos, "C2").getOrElse(
      throw new IllegalArgumentException("Position2D missing C2 (dec)"))

    // identity: Why/Inference/Name, falling back to the ivorn local part
    val name = firstByLocalName(doc, "Why")
      .flatMap(w => textOf(w, "Name"))
      .orElse(Option(ivorn).filter(_.nonEmpty)
        .map(_.split("[#/]").last))
      .getOrElse(throw new IllegalArgumentException(
        "VOEvent carries neither Why/Name nor an ivorn"))

    val isoTime = firstByLocalName(doc, "ISOTime")
      .map(_.getTextContent.trim).getOrElse("")
    val concept = firstByLocalName(doc, "Concept")
      .map(_.getTextContent.trim).getOrElse("VOEvent")

    Parsed(ivorn, name, c1.toDouble, c2.toDouble, isoTime, concept)
  }

  private def secureBuilder(xml: String): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // XXE hardening: the event XML is untrusted input
    f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(
      new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
  }

  private def firstByLocalName(doc: Document, local: String): Option[Element] = {
    val nodes = doc.getElementsByTagNameNS("*", local)
    if (nodes.getLength > 0) Some(nodes.item(0).asInstanceOf[Element])
    else {
      val plain = doc.getElementsByTagName(local)
      if (plain.getLength > 0) Some(plain.item(0).asInstanceOf[Element])
      else None
    }
  }

  private def textOf(parent: Element, local: String): Option[String] = {
    val ns = parent.getElementsByTagNameNS("*", local)
    val n = if (ns.getLength > 0) ns else parent.getElementsByTagName(local)
    if (n.getLength > 0) Some(n.item(0).getTextContent.trim).filter(_.nonEmpty)
    else None
  }
}
