package graft.builds

import org.scalacheck.{Gen, Prop, Properties}
import PregEpisode.{EndpointClass, McaidHierarchy, placeTimeline}

/** ScalaCheck invariants of the pure per-person placement pass (no Spark —
  * 100 random endpoint sets): the structural guarantees the reference's
  * WHILE loops establish, checked independently of how the loop is coded. */
object PregEpisodeProps extends Properties("pregEpisode") {

  private val classNames = McaidHierarchy.map(_.name)

  private val endpoints: Gen[Map[String, Array[Long]]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      cls <- Gen.oneOf(classNames)
      day <- Gen.choose(0L, 2000L)
    } yield (cls, day))
  } yield rows.groupBy(_._1).view
    .mapValues(_.map(_._2).distinct.toArray).toMap

  private def byCls(placed: Seq[(String, Long, Int)]) =
    placed.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

  property("admitted gaps within a class exceed the greedy threshold") =
    Prop.forAll(endpoints) { eps =>
      val placed = byCls(placeTimeline(eps, McaidHierarchy))
      McaidHierarchy.forall { cls =>
        placed.getOrElse(cls.name, Seq.empty).map(_._2)
          .sliding(2).filter(_.size == 2)
          .forall(w => w(1) - w(0) > cls.greedyGapDays)
      }
    }

  property("no placed endpoint violates a higher class's conflict window") =
    Prop.forAll(endpoints) { eps =>
      val placed = byCls(placeTimeline(eps, McaidHierarchy))
      McaidHierarchy.forall { cls =>
        placed.getOrElse(cls.name, Seq.empty).map(_._2).forall { d =>
          cls.conflictWindows.forall { case (h, w) =>
            placed.getOrElse(h, Seq.empty).map(_._2)
              .forall(p => p == d || math.abs(p - d) > w)
          }
        }
      }
    }

  property("episode ids are dense 1..n in date order per class") =
    Prop.forAll(endpoints) { eps =>
      byCls(placeTimeline(eps, McaidHierarchy)).values.forall { rows =>
        rows.map(_._3) == (1 to rows.size)
      }
    }

  property("earliest conflict-free candidate of each class is always placed") =
    Prop.forAll(endpoints) { eps =>
      val out = placeTimeline(eps, McaidHierarchy)
      val placed = byCls(out)
      McaidHierarchy.forall { cls =>
        val survivors = eps.getOrElse(cls.name, Array.empty[Long]).sorted
          .filter { d =>
            cls.conflictWindows.forall { case (h, w) =>
              placed.getOrElse(h, Seq.empty).map(_._2)
                .forall(p => p == d || math.abs(p - d) > w)
            }
          }
        survivors.headOption.forall(first =>
          placed.getOrElse(cls.name, Seq.empty).headOption.exists(_._2 == first))
      }
    }

  property("single lenient class degenerates to admit-all distinct days") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 500L))) { days =>
      val hier = Seq(EndpointClass("x", 0))
      val out = placeTimeline(Map("x" -> days.toArray), hier)
      out.map(_._2).sorted == days.distinct.sorted
    }
}
