package graft

import scala.util.Random
import graft.pipeline._

/** Property-style tests (seeded random trees, no extra deps) for the
  * config-inheritance laws from the reference's dict_tools semantics:
  * most-local-wins, format defaulting, priority defaulting, /common
  * fallback (SURVEY §5's "ScalaCheck properties for config-inheritance
  * laws" slot).
  */
class WorklistLawsSpec extends SparkSpec {

  private def randomTree(rnd: Random): ProductList = {
    def settings(level: String): Map[String, String] =
      (0 until rnd.nextInt(3)).map(_ =>
        s"k${rnd.nextInt(4)}" -> s"${level}_v${rnd.nextInt(100)}").toMap
    ProductList(
      areas = (0 until 1 + rnd.nextInt(3)).map { a =>
        AreaSpec(
          // at most one None ("native") area so area lookup by name is unique
          name = if (a == 0 && rnd.nextBoolean()) None else Some(s"area$a"),
          priority = if (rnd.nextBoolean()) Some(rnd.nextInt(5)) else None,
          products = (0 until 1 + rnd.nextInt(3)).map { p =>
            ProductSpec(s"prod$p",
              formats = (0 until rnd.nextInt(3)).map(f =>
                FormatSpec(s"fmt$f", settings("format"))),
              settings = settings("product"))
          },
          settings = settings("area"))
      },
      settings = settings("root"),
      common = Map("k0" -> "common_v", "kc" -> "common_only"))
  }

  test("expansion size, defaults, and inheritance hold for random trees") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val spec = randomTree(rnd)
      val items = Worklist.expand(spec)
      // size law: one item per (area, product, format-or-default)
      val expected = spec.areas.map(a =>
        a.products.map(p => math.max(1, p.formats.size)).sum).sum
      assert(items.size == expected)
      items.foreach { it =>
        // defaults
        if (it.format == Worklist.DefaultFormat.format) () // tif allowed anywhere
        assert(it.priority != 0 || spec.areas.exists(_.priority.contains(0)))
        // most-local-wins: recompute from the tree independently
        val area = spec.areas.find(_.name == it.area)
          .getOrElse(spec.areas.find(a =>
            a.products.exists(_.name == it.product)).get)
        val prod = area.products.find(_.name == it.product).get
        val fmt = prod.formats.find(_.format == it.format)
        for (k <- (spec.settings.keySet ++ area.settings.keySet ++
                   prod.settings.keySet ++ fmt.map(_.settings.keySet).getOrElse(Set.empty))) {
          val want = fmt.flatMap(_.settings.get(k))
            .orElse(prod.settings.get(k))
            .orElse(area.settings.get(k))
            .orElse(spec.settings.get(k))
          assert(it.settings.get(k) == want, s"key $k on $it")
        }
        // /common is a fallback only, never an override
        if (it.settings.contains("k0"))
          assert(Worklist.configValue(spec, it, "k0") == it.settings.get("k0"))
        assert(Worklist.configValue(spec, it, "kc").contains("common_only"))
        assert(Worklist.configValue(spec, it, "absent", Some("dflt")).contains("dflt"))
      }
      // priorities: defaulted items land in group 999, groups ascend
      val groups = Worklist.byPriority(items)
      assert(groups.map(_._1) == groups.map(_._1).sorted)
      assert(groups.flatMap(_._2).toSet == items.toSet)
      items.filter(it => spec.areas.find(_.name == it.area)
          .forall(_.priority.isEmpty))
        .foreach(it => assert(it.priority == Worklist.DefaultPriority ||
          spec.areas.exists(_.priority.contains(it.priority))))
    }
  }
}
