package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generated cases over the codec/archive layer, on top of CodecSpec/
  * TarSpec's fixed fixtures: round trips must hold for ARBITRARY
  * payload bytes, member sequences, and chunk re-splits — the
  * properties the per-partition incremental parsers actually promise. */
object CodecProps extends Properties("Codec") {

  private val fmtGen: Gen[Codec.Format] =
    Gen.oneOf(Codec.Gzip, Codec.Zlib, Codec.Raw, Codec.Zstd, Codec.Lz4)
  private val payloadGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte)))

  private def concat(xs: Seq[Array[Byte]]): Array[Byte] =
    xs.foldLeft(Array.emptyByteArray)(_ ++ _)

  property("deflate/inflate round-trips arbitrary bytes in every format") =
    forAll(fmtGen, payloadGen) { (f, p) =>
      Codec.inflateAll(Codec.deflateChunk(p, f), f).sameElements(p)
    }

  property("multi-member streams re-split at any chunk size round-trip") =
    forAll(fmtGen, Gen.listOfN(3, payloadGen), Gen.chooseNum(1, 97)) { (f, ps, split) =>
      val stream = concat(ps.map(Codec.deflateChunk(_, f)))
      val got = concat(Codec.inflateStream(stream.grouped(split), f, 256).toSeq)
      got.sameElements(concat(ps))
    }

  property("decodeCharsStream is chunking-invariant on arbitrary unicode") =
    forAll(Gen.listOf(Gen.oneOf("a", "ß", "你", "🎉", " ", "\n", "é")),
      Gen.chooseNum(1, 7)) { (parts, split) =>
      val text = parts.mkString
      val raw = text.getBytes("UTF-8")
      Codec.decodeCharsStream(raw.grouped(split), "UTF-8").mkString == text
    }

  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString
  private val membersGen: Gen[List[(String, Array[Byte])]] =
    Gen.chooseNum(0, 6).flatMap(k =>
      Gen.listOfN(k, Gen.zip(nameGen, payloadGen)))

  property("tar archive/entries round-trips arbitrary members at any chunking") =
    forAll(membersGen, Gen.chooseNum(1, 600)) { (members, split) =>
      val a = Tar.archive(members)
      val got = Tar.entries(a.grouped(split)).toList
      got.map(_._1) == members.map(_._1) &&
        got.zip(members).forall { case ((_, g), (_, w)) => g.sameElements(w) }
    }

  property("gzip tar composes: archive -> deflate -> inflate -> entries") =
    forAll(membersGen) { members =>
      val gz = Codec.deflateChunk(Tar.archive(members), Codec.Gzip)
      val got = Tar.entries(Codec.inflateStream(gz.grouped(113), Codec.Gzip, 512)).toList
      got.map(_._1) == members.map(_._1) &&
        got.zip(members).forall { case ((_, g), (_, w)) => g.sameElements(w) }
    }
}
