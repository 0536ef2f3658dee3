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

  // ---- adversarial parity pins (SURVEY §7.4 fiddliness; round-6
  // verdict item 6): separator-free runs, overlap≥size, 。-only text ----

  test("overlap >= chunkSize fails loudly (the splitter's own contract)") {
    // LangChain's RecursiveCharacterTextSplitter raises ValueError for
    // chunk_overlap > chunk_size; equality is equally unusable (the
    // slide-back could never make progress) — both are rejected here
    assertThrows[IllegalArgumentException](Chunker.split("abc def", 100, 100))
    assertThrows[IllegalArgumentException](Chunker.split("abc def", 100, 150))
  }

  test("separator-free run: one oversized chunk, byte-identical to the input") {
    val blob = "x" * 5000
    assert(Chunker.split(blob, 200, 40) == Seq(blob))
  }

  test("oversized words between spaces are emitted oversized, small tail kept") {
    val text = ("a" * 900) + " " + ("b" * 900) + " " + ("c" * 50)
    val chunks = Chunker.split(text, 200, 40)
    // every run survives uncut; nothing is silently dropped
    assert(chunks.exists(_.contains("a" * 900)))
    assert(chunks.exists(_.contains("b" * 900)))
    assert(chunks.exists(_.contains("c" * 50)))
    assert(chunks.forall(c => text.contains(c.replace("\n", ""))
      || text.contains(c)))
  }

  test("。-only Korean text splits on 。 with bounded chunks and full coverage") {
    val sents = (1 to 40).map(i => s"문장${i}입니다。")
    val text = sents.mkString
    val chunks = Chunker.split(text, 60, 20)
    assert(chunks.forall(_.length <= 60))
    (1 to 40).foreach(i => assert(chunks.exists(_.contains(s"문장${i}입니다")),
      s"sentence $i missing"))
    assert(Chunker.split(text, 60, 20) == chunks) // deterministic
  }

  test("property: substring/order/coverage invariants over mixed separators (200 seeded cases)") {
    val rnd = new scala.util.Random(7)
    val seps = Seq("\n\n", "\n", "。", ". ", "? ", "! ", " ")
    (1 to 200).foreach { iter =>
      val nWords = 1 + rnd.nextInt(80)
      val sb = new StringBuilder
      (1 to nWords).foreach { i =>
        sb.append(s"w${iter}x$i")
        if (i < nWords) sb.append(seps(rnd.nextInt(seps.length)))
      }
      val text = sb.toString
      val size = 20 + rnd.nextInt(200)
      val overlap = rnd.nextInt(math.min(size, 100))
      val chunks = Chunker.split(text, size, overlap)
      assert(chunks.nonEmpty)
      // every chunk is a contiguous substring of the input (merging
      // never fabricates or reorders content)...
      chunks.foreach(c => assert(text.contains(c),
        s"iter $iter: chunk not a substring: '$c'"))
      // ...chunks appear in input order (unique words → unique chunks)...
      val positions = chunks.map(text.indexOf)
      assert(positions == positions.sorted, s"iter $iter: out of order")
      // ...and nothing is lost: every (unique) word lands in a chunk
      (1 to nWords).foreach(i =>
        assert(chunks.exists(_.contains(s"w${iter}x$i")),
          s"iter $iter: word $i dropped"))
      assert(Chunker.split(text, size, overlap) == chunks)
    }
  }
}
