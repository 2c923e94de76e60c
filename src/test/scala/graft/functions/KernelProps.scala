package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure JVM kernels behind the codegen'd
  * expressions — fast (no Spark jobs), 100 cases each. */
object KernelProps extends Properties("kernels") {

  private val token: Gen[String] = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val tokens: Gen[List[String]] = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, token))

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  property("simhash is token-order invariant") = Prop.forAll(tokens) { ts =>
    SimHash64.simhashStrings(ts) == SimHash64.simhashStrings(scala.util.Random.shuffle(ts))
  }

  property("simhash matches the ArrayData kernel") = Prop.forAll(tokens) { ts =>
    SimHash64.simhashStrings(ts) == SimHash64.simhash(arr(ts))
  }

  property("shingle hashes are sorted, distinct, and counted right") =
    Prop.forAll(tokens, Gen.choose(2, 4)) { (ts, n) =>
      val out = ShingleHashes.hashes(arr(ts), n)
      val longs = (0 until out.numElements()).map(out.getLong)
      val expectedMax = math.max(ts.length - n + 1, 1)
      (longs == longs.sorted && longs.distinct == longs &&
        longs.nonEmpty && longs.length <= expectedMax)
    }

  property("identical texts share all shingles; disjoint vocabularies none") =
    Prop.forAll(tokens.suchThat(_.length >= 4)) { ts =>
      val a = ShingleHashes.hashes(arr(ts), 3)
      val b = ShingleHashes.hashes(arr(ts), 3)
      val disjoint = ShingleHashes.hashes(arr(ts.map(_ + "~x")), 3)
      val sa = (0 until a.numElements()).map(a.getLong).toSet
      val sb = (0 until b.numElements()).map(b.getLong).toSet
      val sd = (0 until disjoint.numElements()).map(disjoint.getLong).toSet
      sa == sb && sa.intersect(sd).isEmpty
    }

  private val asciiText: Gen[String] = Gen.choose(0, 60)
    .flatMap(n => Gen.listOfN(n,
      Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))))
    .map(_.mkString)

  property("winnow deque kernel equals the naive per-window minimum") =
    Prop.forAll(asciiText, Gen.choose(2, 6), Gen.choose(1, 5)) { (s, k, w) =>
      val got = {
        val a = WinnowFingerprints.fingerprints(UTF8String.fromString(s), k, w)
        (0 until a.numElements()).map(a.getLong).toSet
      }
      // naive reference: every k-gram polynomial hash, then plain
      // per-window minima in unsigned order
      val b = s.getBytes("UTF-8")
      val naive: Set[Long] =
        if (b.length <= k)
          Set(b.foldLeft(0L)((h, c) => h * WinnowFingerprints.Base + (c & 0xffL)))
        else {
          val hs = b.sliding(k).map(
            _.foldLeft(0L)((h, c) => h * WinnowFingerprints.Base + (c & 0xffL))).toVector
          val effW = math.min(w, hs.length)
          hs.sliding(effW).map(_.minBy(h => h ^ Long.MinValue)).toSet
        }
      got == naive
    }

  property("winnow fingerprints of a doc survive in any superstring") =
    Prop.forAll(asciiText.suchThat(_.length >= 20), asciiText, asciiText) {
      (core, pre, post) =>
        def fps(s: String): Set[Long] = {
          val a = WinnowFingerprints.fingerprints(UTF8String.fromString(s), 5, 3)
          (0 until a.numElements()).map(a.getLong).toSet
        }
        // winnowing guarantee: >= 1 shared fingerprint whenever the shared
        // run is at least k + w - 1 chars
        fps(pre + core + post).intersect(fps(core)).nonEmpty
    }

  property("minhash signature entries are mins over per-shingle hashes") =
    Prop.forAll(tokens.suchThat(_.nonEmpty), Gen.choose(1, 8)) { (ts, k) =>
      val sh = ShingleHashes.hashes(arr(ts), 3)
      val sig = MinHashFromHashes.sig(sh, k)
      val shingleLongs = (0 until sh.numElements()).map(sh.getLong)
      (0 until k).forall { j =>
        val expect = shingleLongs.map(h =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, j)).min
        sig.getLong(j) == expect
      }
    }

  property("minhash similarity estimates containment: equal sets agree everywhere") =
    Prop.forAll(tokens.suchThat(_.length >= 3)) { ts =>
      val sh = ShingleHashes.hashes(arr(ts), 3)
      val a = MinHashFromHashes.sig(sh, 16)
      val b = MinHashFromHashes.sig(sh, 16)
      (0 until 16).forall(j => a.getLong(j) == b.getLong(j))
    }
}
