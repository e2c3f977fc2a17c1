package graft.pipeline

/** The product-list config model (reference: the YAML product list,
  * doc/source/product_list.rst:12, examples/pl.yaml:10-192).
  *
  * A 3-level tree — root → areas → products → formats — where every level
  * may set arbitrary string settings and inner levels override outer ones.
  * Differences from the reference, by design:
  *   - parsed from typed case classes, or from YAML/JSON via the safe
  *     [[ProductListLoader]] — never with arbitrary-code constructors
  *     (`!!python/name:` — launcher.py:404's UnsafeLoader is a non-goal;
  *     plugin names resolve against the plugin registry instead);
  *   - the config is immutable; "pruning" plugins filter the expanded
  *     work-list rather than mutating the tree (the reference mutates via
  *     dpath.delete, plugins/__init__.py:668-669).
  */
final case class FormatSpec(
    format: String,
    settings: Map[String, String] = Map.empty)

final case class ProductSpec(
    name: String,
    /** Tuple-products: extra channel names loaded/saved together
      * (doc/source/product_list.rst:62). */
    members: Seq[String] = Seq.empty,
    formats: Seq[FormatSpec] = Seq.empty,
    settings: Map[String, String] = Map.empty)

final case class AreaSpec(
    /** None = "satellite projection, no resampling" (the reference's
      * `null:` area key, launcher.py:479-480). */
    name: Option[String],
    priority: Option[Int] = None,
    products: Seq[ProductSpec] = Seq.empty,
    settings: Map[String, String] = Map.empty)

final case class ProductList(
    areas: Seq[AreaSpec],
    settings: Map[String, String] = Map.empty,
    /** `/common` fallback namespace (dict_tools.py:93-96). */
    common: Map[String, String] = Map.empty)

/** One flattened work-list row = one (area, product, format) output task
  * with its fully-resolved settings (`plist_iter` semantics,
  * dict_tools.py:26-62). */
final case class WorkItem(
    area: Option[String],
    priority: Int,
    product: String,
    members: Seq[String],
    format: String,
    settings: Map[String, String])

object Worklist {
  /** Default formats when a product declares none:
    * `[{format: tif}]` (dict_tools.py:58). */
  val DefaultFormat: FormatSpec = FormatSpec("tif")
  /** Default priority (launcher.py:59, 253-266): unset = 999, lowest last. */
  val DefaultPriority = 999

  /** `plist_iter`: depth-first flatten, inner-level settings override
    * outer (golden expectations ported from test_dict_tools.py:166-192).
    * Config expansion is driver-side on purpose — it is configuration
    * (a few hundred rows), not data; the expanded work-list can then be
    * lifted to a DataFrame and joined/filtered at any scale. */
  def expand(spec: ProductList): Seq[WorkItem] =
    for {
      area <- spec.areas
      product <- area.products
      fmt <- (if (product.formats.isEmpty) Seq(DefaultFormat) else product.formats)
    } yield WorkItem(
      area = area.name,
      priority = area.priority.getOrElse(DefaultPriority),
      product = product.name,
      members = if (product.members.isEmpty) Seq(product.name) else product.members,
      format = fmt.format,
      settings =
        // most-local-wins: root < common-is-fallback-only < area < product < format
        spec.settings ++ area.settings ++ product.settings ++ fmt.settings)

  /** `get_config_value` (dict_tools.py:80-99): most-local-wins lookup with
    * `/common` fallback, then default — hierarchical coalesce. */
  def configValue(spec: ProductList, item: WorkItem, key: String,
                  default: Option[String] = None): Option[String] =
    item.settings.get(key)            // format > product > area > root (pre-merged)
      .orElse(spec.common.get(key))   // /common fallback
      .orElse(default)

  /** Priority-ordered groups, lowest number first (`get_area_priorities` +
    * `sorted(jobs.keys())`, launcher.py:253-266, 434). */
  def byPriority(items: Seq[WorkItem]): Seq[(Int, Seq[WorkItem])] =
    items.groupBy(_.priority).toSeq.sortBy(_._1)
}
