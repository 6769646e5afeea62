package graft.cli

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {

  test("positional grammar: flags anywhere before srcs/dst/cmd") {
    val a = Main.parse(Seq("-m", "4", "/src1", "/src2", "/dst", "grep x"))
    assert(a.srcs == Seq("/src1", "/src2") && a.dst == "/dst" && a.command == "grep x")
    assert(a.maxMaps.contains(4) && !a.redirectErrorToOut && !a.singleOut)
  }

  test("-D and -conf passthrough: both forms parsed, order preserved") {
    val a = Main.parse(Seq(
      "-D", "copy.buf.size=8192", "-Dio.file.buffer.size=4096",
      "-conf", "/etc/extra.xml", "/src", "/dst", "cat"))
    assert(a.confProps == Seq("copy.buf.size" -> "8192", "io.file.buffer.size" -> "4096"))
    assert(a.confFiles == Seq("/etc/extra.xml"))
    assert(a.srcs == Seq("/src") && a.dst == "/dst" && a.command == "cat")
  }

  test("-D requires key=value") {
    intercept[IllegalArgumentException](Main.parse(Seq("-D", "novalue", "/s", "/d", "cat")))
    intercept[IllegalArgumentException](Main.parse(Seq("-D")))
  }

  test("applyConf: -D keys reach the Hadoop conf and win over resources") {
    val xml = java.nio.file.Files.createTempFile("graft-conf", ".xml")
    java.nio.file.Files.writeString(xml,
      """<?xml version="1.0"?><configuration>
        |<property><name>graft.test.key</name><value>from-file</value></property>
        |<property><name>graft.only.file</name><value>yes</value></property>
        |</configuration>""".stripMargin)
    val parsed = Main.parse(Seq(
      "-conf", xml.toString, "-D", "graft.test.key=from-D", "/s", "/d", "cat"))
    val conf = new Configuration(false)
    Main.applyConf(conf, parsed)
    assert(conf.get("graft.test.key") == "from-D", "-D wins over -conf resources")
    assert(conf.get("graft.only.file") == "yes", "-conf resource keys are loaded")
  }
}
