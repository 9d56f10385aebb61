package graft.petro.hpxeos

/** Registry of every THERMOCALC a-x phase across the three axfile sets
  * (reference: src/petropandas/hpxeos/__init__.py and the per-set
  * __init__ exports). Mirrors the reference's flat TC_* namespace:
  * phases are addressable by (set, abbreviation), and the igneous set
  * additionally re-exports the metapelite ep/mu/pl4tr and metabasite hb
  * blocks it shares verbatim (igneous/__init__.py:1-47). */
object Hpxeos {

  val metapelite: Seq[Phase] = Metapelite.phases
  val metabasite: Seq[Phase] = Metabasite.phases
  val igneous: Seq[Phase] = Igneous.phases

  /** The igneous axfile's full working set: its 8 own phases plus the
    * four blocks reused unchanged from the other sets. */
  val igneousFull: Seq[Phase] = Igneous.phases ++ Seq(
    Metapelite.TcEpidote, Metapelite.TcMuscovite, Metapelite.TcPl4tr,
    Metabasite.TcAmphibole)

  /** All 39 concrete phase objects — 19 metapelite + 12 metabasite + 8
    * igneous, one per reference TC_* export (T7 parity). */
  val all: Seq[Phase] = metapelite ++ metabasite ++ igneous

  /** Lookup by (set, abbreviation) — abbreviations repeat across sets
    * (metapelite g vs metabasite g), so the set name disambiguates. */
  val bySet: Map[(String, String), Phase] =
    (metapelite.map(p => ("metapelite", p.abbreviation) -> p) ++
      metabasite.map(p => ("metabasite", p.abbreviation) -> p) ++
      igneous.map(p => ("igneous", p.abbreviation) -> p)).toMap

  def apply(set: String, abbreviation: String): Phase =
    bySet.getOrElse((set, abbreviation),
      throw new NoSuchElementException(
        s"no hpxeos phase '$abbreviation' in set '$set'; known: " +
          bySet.keys.toSeq.sorted.mkString(", ")))
}
