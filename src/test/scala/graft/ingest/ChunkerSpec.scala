package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {

  test("short text → single trimmed chunk") {
    assert(Chunker.split("hello world", 700, 120) == Seq("hello world"))
    assert(Chunker.split("", 700, 120).isEmpty)
  }

  test("splits prefer paragraph > newline > sentence boundaries") {
    val text = ("para one sentence. " * 10) + "\n\n" + ("para two sentence. " * 10)
    val chunks = Chunker.split(text, 200, 40)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 200))
    // paragraph boundary respected: no chunk spans the "\n\n"
    assert(chunks.forall(c => !c.contains("\n\n")))
  }

  test("content coverage: every sentence of the input appears in some chunk") {
    val text = (1 to 30).map(i => s"sentence number $i here.").mkString(" ")
    val chunks = Chunker.split(text, 150, 30)
    (1 to 30).foreach { i =>
      assert(chunks.exists(_.contains(s"sentence number $i here")),
        s"sentence $i missing")
    }
  }

  test("consecutive chunks overlap when overlap > 0") {
    val text = (1 to 40).map(i => s"s$i end.").mkString(" ")
    val chunks = Chunker.split(text, 100, 40)
    assert(chunks.size > 1)
    val overlapping = chunks.sliding(2).count {
      case Seq(a, b) => a.takeRight(20).split("\\s+").exists(t =>
        t.nonEmpty && b.contains(t))
      case _ => true
    }
    assert(overlapping >= chunks.size - 2)
  }

  test("unbreakable run emitted oversized, not cut") {
    val blob = "x" * 900
    val chunks = Chunker.split(s"start. $blob. end.", 200, 40)
    assert(chunks.exists(_.length >= 900))
  }

  test("knowledge fixture: 700/120 chunking is stable and bounded") {
    graft.fixtures.Fixtures.knowledgeRows.foreach { case (_, term, d, r, dt) =>
      val content = s"passage: [정의] $term ...\n\n$d $r $dt"
      val chunks = Chunker.split(content, 700, 120)
      assert(chunks.nonEmpty)
      assert(chunks.forall(_.length <= 700))
      assert(Chunker.split(content, 700, 120) == chunks) // deterministic
    }
  }

  test("regression golden: 700/120 chunking of a Korean knowledge doc is pinned") {
    val (_, term, d, r, dt) = graft.fixtures.Fixtures.knowledgeRows(1)
    val content = s"passage: [정의] ${term}는 무엇인가? $d\n[역할] $r\n[설명] $dt\n\n" +
      (d + " ") * 10 // pad well past one chunk
    val chunks = Chunker.split(content, 700, 120)
    assert(chunks.size >= 2)
    assert(chunks.head.startsWith("passage: [정의] Self-Attention"))
    assert(chunks.head.length <= 700 && chunks(1).length <= 700)
    // overlap carry: second chunk re-starts inside the padded tail
    assert(chunks(1).contains("Self-Attention은 동일 시퀀스"))
  }

  test("property: chunks bounded by size when text has spaces (100 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val text = (1 to (1 + rnd.nextInt(200)))
        .map(_ => s"w${rnd.nextInt(1000)}").mkString(" ")
      val chunks = Chunker.split(text, 50, 10)
      assert(chunks.forall(_.length <= 50), s"oversized chunk for: $text")
    }
  }
}
