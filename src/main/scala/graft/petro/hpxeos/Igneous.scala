package graft.petro.hpxeos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.petro.{Convert, MineralSpec, SiteDef, ValenceSplit}

/** Igneous (NCKFMASHTOCr) a-x phases from the published THERMOCALC axfile
  * tc-ig51NCKFMASHTOCr.txt (Green, Holland, Powell, Weller & Riel 2025, a
  * corrigendum to Holland, Green & Powell 2018). Block strings are
  * verbatim axfile data (reference transcription:
  * src/petropandas/hpxeos/igneous/). The axfile set also reuses the
  * metapelite ep/mu/pl4tr and metabasite hb blocks unchanged — those live
  * in [[Metapelite]]/[[Metabasite]] and are not duplicated here. */
object Igneous {

  /** Garnet 'g_W24' — Weller et al. (2024); adds Cr/Ti end-members
    * (knor, tig) with the coupled Mg-Ti substitution on M2
    * (reference: hpxeos/igneous/garnet.py). */
  object TcGarnetW24 extends Phase {
    val abbreviation = "g_W24"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}"),
      "M2" -> Seq("Al{3+}", "Cr{3+}", "Fe{3+}", "Mg{2+}", "Ti{4+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("py", "alm", "gr", "andr", "knor", "tig")
    val mineral: MineralSpec = MineralSpec("TC_g_W24", 12, Some(8),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("Z", 3.0, Seq("Si{4+}", "Al{3+}")),
        SiteDef("Y", 2.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}")),
        SiteDef("X", 3.0, Seq("Fe{2+}", "Mg{2+}", "Ca{2+}", "Mn{2+}"))),
      totalRange = (99.0, 101.0))

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (g block).
    val pBlock = """
p(py)      2 1    1  4  -1  c  -1  cr  -1  x  -4  t
             2    0  1  1  c    0  1  1  x

p(alm)     2 1    0  1   1  x
             2    0  1  -1  c    0  1  1  x

p(gr)      1 1    0  2   1  c  -1  f

p(andr)    1 1    0  1  1  f

p(knor)    1 1    0  1  1  cr

p(tig)     1 1    0  1  4  t
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (g sf block).
    override val sfBlock = """
xMgM1      2 1    1  2  -1  c  -1  x
             2    0  1  1  c    0  1  1  x

xFeM1      2 1    0  1   1  x
             2    0  1  -1  c    0  1  1  x

xCaM1      1 1    0  1  1  c

xAlM2      1 1    1  3  -1  cr  -1  f  -2  t

xCrM2      1 1    0  1  1  cr

xFe3M2     1 1    0  1  1  f

xMgM2      1 1    0  1  1  t

xTiM2      1 1    0  1  1  t
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Ca" -> comp("Ca{2+}"),
      "Cr" -> comp("Cr{3+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Ti" -> comp("Ti{4+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = {
      // tig couples Ti 1:1 with an extra Mg on M2, so the M1-only Mg pool
      // is bulk Mg minus Ti (reference: igneous/garnet.py:126-139).
      val mgM1 = sf("Mg") - sf("Ti")
      Seq(
        "x" -> sf("Fe") / (sf("Fe") + mgM1),
        "c" -> sf("Ca") / 3.0,
        "f" -> sf("Fe3") / 2.0,
        "cr" -> sf("Cr") / 2.0,
        "t" -> sf("Ti") / 2.0)
    }
  }

  /** Clinopyroxene 'cpx_W24' — Weller et al. (2024); the largest pyroxene
    * model, Cr/Ti/K end-members
    * (reference: hpxeos/igneous/clinopyroxene.py). */
  object TcClinopyroxeneW24 extends Phase {
    val abbreviation = "cpx_W24"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}", "Cr{3+}", "Ti{4+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}", "Na{+}", "K{+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("di", "cfs", "cats", "crdi", "cess", "cbuf",
      "jd", "cen", "cfm", "kjd")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec =
      Metabasite.TcAugite.mineral.copy(name = "TC_cpx_W24")

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (cpx block).
    val pBlock = """
p(di)      1 1    1  4  -1  k  -1  n  -1  o  -1  y

p(cfs)     9 1    0  2   1  Q   1  x
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  k    0  1  1  x
             2    0  1  -1  n    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y

p(cats)    1 1    0  4  -1  cr  -1  f   1  y  -2  t

p(crdi)    1 1    0  1  1  cr

p(cess)    1 1    0  1  1  f

p(cbuf)     1 1    0  1  2  t

p(jd)      1 1    0  1  1  n

p(cen)     6 1    0  2   1  o   1  Q
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  o    0  1  1  x
             2    0  1  -1  Q    0  1  1  y

p(cfm)     10 1    0  2  -1  x  -2  Q
             2    0  1  2  k    0  1  1  Q
             2    0  1  2  n    0  1  1  Q
             2    0  1  -2  Q    0  1  1  t
             2    0  1  1  k    0  1  1  x
             2    0  1  1  n    0  1  1  x
             2    0  1  1  o    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  2  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y

p(kjd)     1 1    0  1  1  k
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (cpx sf block).
    override val sfBlock = """
xMgM1      9 1    1  6  -1  k  -1  n  -1  Q   1  t  -1  x  -1  y
             2    0  1  1  k    0  1  1  Q
             2    0  1  1  n    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  1  k    0  1  1  x
             2    0  1  1  n    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM1      9 1    0  2   1  Q   1  x
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  k    0  1  1  x
             2    0  1  -1  n    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM1      1 1    0  6  -1  cr  -1  f   1  k   1  n   1  y  -2  t

xFe3M1     1 1    0  1  1  f

xCrM1      1 1    0  1  1  cr

xTiM1      1 1    0  1  1  t

xMgM2      6 1    0  2   1  o   1  Q
             2    0  1  -1  k    0  1  1  Q
             2    0  1  -1  n    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  o    0  1  1  x
             2    0  1  -1  Q    0  1  1  y

xFeM2      6 1    0  1  -1  Q
             2    0  1  1  k    0  1  1  Q
             2    0  1  1  n    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  1  o    0  1  1  x
             2    0  1  1  Q    0  1  1  y

xCaM2      1 1    1  3  -1  k  -1  n  -1  o

xNaM2      1 1    0  1  1  n

xKM2       1 1    0  1  1  k

xSiT       1 1    1  1  -1/2  y

xAlT       1 1    0  1  1/2  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Ca" -> comp("Ca{2+}"),
      "Na" -> comp("Na{+}"),
      "K" -> comp("K{+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Ti" -> comp("Ti{4+}"),
      "Cr" -> comp("Cr{3+}"),
      "AlT" -> (lit(2.0) - comp("Si{4+}")))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlT"),
      "o" -> (lit(1.0) - sf("Ca") - sf("Na") - sf("K")),
      "n" -> sf("Na"),
      "f" -> sf("Fe3"),
      "t" -> sf("Ti"),
      "cr" -> sf("Cr"),
      "k" -> sf("K"),
      "Q" -> order("Q"))
  }

  /** Spinel 'spl_T21' — Tomlinson & Holland (2021); real T/M sites and
    * three normal/inverse order parameters
    * (reference: hpxeos/igneous/spinel.py). */
  object TcSpinelT21 extends Phase {
    val abbreviation = "spl_T21"
    val sites = Seq(
      "T" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}"),
      "M" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}", "Cr{3+}", "Ti{4+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("nsp", "isp", "nhc", "ihc", "nmt", "imt",
      "picr", "usp")
    override val orderParameterNames = Seq("Q1", "Q2", "Q3")
    val mineral: MineralSpec = MineralSpec("TC_spl_T21", 4, Some(3),
      Seq(ValenceSplit("Fe", "droop")),
      Seq(
        SiteDef("M1", 1.0, Seq("Mg{2+}", "Fe{2+}")),
        SiteDef("M2", 2.0, Seq("Al{3+}", "Fe{3+}", "Ti{4+}"))),
      totalRange = (99.0, 101.0), preprocess = Convert.fe2o3ToFeo)

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (spl block).
    val pBlock = """
p(nsp)     2 1    1/3  4  1/3  t  -1/3  x  -1  c  2/3  Q1
             2    0  1  -1/3  t    0  1  1  x

p(isp)     2 1    2/3  3  -2/3  Q1  2/3  t  -2/3  x
             2    0  1  -2/3  t    0  1  1  x

p(nhc)      4 1    0  5  1/3  x  -1/3  y  -1  t  2/3  Q2  2/3  Q3
             2    0  1  1/3  t    0  1  1  x
             2    0  1  1/3  c    0  1  1  y
             2    0  1  1/3  t    0  1  1  y

p(ihc)     4 1    0  5  -1  t  -2/3  Q2  -2/3  Q3  2/3  x  -2/3  y
             2    0  1  2/3  t    0  1  1  x
             2    0  1  2/3  c    0  1  1  y
             2    0  1  2/3  t    0  1  1  y

p(nmt)     3 1    0  2  1/3  y  -2/3  Q3
             2    0  1  -1/3  c    0  1  1  y
             2    0  1  -1/3  t    0  1  1  y

p(imt)     3 1    0  2  2/3  Q3  2/3  y
             2    0  1  -2/3  c    0  1  1  y
             2    0  1  -2/3  t    0  1  1  y

p(picr)    1 1    0  1  1  c

p(usp)     1 1    0  1  1  t
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (spl sf block).
    override val sfBlock = """
xMgT       2 1    1/3  3  1/3  t  -1/3  x  2/3  Q1
             2    0  1  -1/3  t    0  1  1  x

xFeT       2 1    0  2  1/3  x  2/3  Q2
             2    0  1  1/3  t    0  1  1  x

xAlT       3 1    2/3  5  -1/3  t  -2/3  Q1  -2/3  Q2  -2/3  Q3  -2/3  y
             2    0  1  2/3  c    0  1  1  y
             2    0  1  2/3  t    0  1  1  y

xFe3T      3 1    0  2  2/3  Q3  2/3  y
             2    0  1  -2/3  c    0  1  1  y
             2    0  1  -2/3  t    0  1  1  y

xMgM       2 1    1/3  3  -1/3  Q1  1/3  t  -1/3  x
             2    0  1  -1/3  t    0  1  1  x

xFeM       2 1    0  2  -1/3  Q2  1/3  x
             2    0  1  1/3  t    0  1  1  x

xAlM       3 1    2/3  6  1/3  Q1  1/3  Q2  1/3  Q3  -1  c  -2/3  y  -5/6  t
             2    0  1  2/3  c    0  1  1  y
             2    0  1  2/3  t    0  1  1  y

xFe3M      3 1    0  2  -1/3  Q3  2/3  y
             2    0  1  -2/3  c    0  1  1  y
             2    0  1  -2/3  t    0  1  1  y

xCrM       1 1    0  1  1  c

xTiM       1 1    0  1  1/2  t
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Al" -> comp("Al{3+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Cr" -> comp("Cr{3+}"),
      "Ti" -> comp("Ti{4+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("Fe3") / (sf("Al") + sf("Fe3")),
      "c" -> sf("Cr") / 2.0,
      "t" -> sf("Ti"),
      "Q1" -> order("Q1"), "Q2" -> order("Q2"), "Q3" -> order("Q3"))
  }

  /** Olivine 'ol_H18' — Holland, Green & Powell (2018) CFMS olivine with
    * monticellite and Fe/Mg ordering
    * (reference: hpxeos/igneous/olivine.py). */
  object TcOlivineH18 extends Phase {
    val abbreviation = "ol_H18"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}"))
    val endMemberNames = Seq("mont", "fa", "fo", "cfm")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec = MineralSpec("TC_ol_H18", 4, Some(3), Nil,
      Seq(
        SiteDef("T", 1.0, Seq("Si{4+}")),
        SiteDef("M", 2.0, Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Ca{2+}"))),
      totalRange = (98.0, 101.0))

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (ol block).
    val pBlock = """
p(mont)    1 1    0  1  1  c

p(fa)      1 1    0  2  -1  Q   1  x

p(fo)      2 1    1  3  -1  c  -1  Q  -1  x
             2    0  1  1  c    0  1  1  x

p(cfm)     2 1    0  1  2  Q
             2    0  1  -1  c    0  1  1  x
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (ol sf block).
    override val sfBlock = """
xMgM1      1 1    1  2   1  Q  -1  x

xFeM1      1 1    0  2  -1  Q   1  x

xMgM2      2 1    1  3  -1  c  -1  Q  -1  x
             2    0  1  1  c    0  1  1  x

xFeM2      2 1    0  2   1  Q   1  x
             2    0  1  -1  c    0  1  1  x

xCaM2      1 1    0  1  1  c
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Ca" -> comp("Ca{2+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "c" -> sf("Ca"),
      "Q" -> order("Q"))
  }

  /** Biotite 'bi_G25' — Mn-free core of the metapelite biotite; only the
    * Al end-member is relabeled est (reference: hpxeos/igneous/biotite.py). */
  object TcBiotiteG25 extends Phase {
    val abbreviation = "bi_G25"
    val sites = Metabasite.TcBiotite.sites
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("phl", "annm", "obi", "est", "tbi", "fbi")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec =
      Metapelite.TcBiotite.mineral.copy(name = "TC_bi_G25")

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (bi block).
    val pBlock = """
p(phl)     4 1    1  5  -1  f  -1  t  -1  x  -1  y  -2/3  Q
             2    0  1  1  f    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  1  x    0  1  1  y

p(annm)    1 1    0  2  -1/3  Q   1  x

p(obi)     4 1    0  1   1  Q
             2    0  1  -1  f    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  -1  x    0  1  1  y

p(est)     1 1    0  1  1  y

p(tbi)     1 1    0  1  1  t

p(fbi)     1 1    0  1  1  f
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] =
      Metabasite.TcBiotite.siteFractions(comp, siteTotal)

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] =
      Metabasite.TcBiotite.variables(sf, order)
  }

  /** Cordierite 'cd_G25' — Mn-free core of the metapelite cordierite
    * (reference: hpxeos/igneous/cordierite.py). */
  object TcCordieriteG25 extends Phase {
    val abbreviation = "cd_G25"
    val sites = Seq("X" -> Seq("Fe{2+}", "Mg{2+}"))
    val endMemberNames = Seq("crd", "fcrd", "hcrd")
    override val orderParameterNames = Seq("h")
    val mineral: MineralSpec = MineralSpec("TC_cd_G25", 18, None, Nil,
      Seq(SiteDef("X", 2.0, Seq("Fe{2+}", "Mg{2+}", "Mn{2+}"))),
      totalRange = (97.0, 101.0))

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (cd block).
    val pBlock = """
p(crd)     1 1    1  2  -1  h  -1  x

p(fcrd)    1 1    0  1  1  x

p(hcrd)    1 1    0  1  1  h
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (cd sf block).
    override val sfBlock = """
xFeX       1 1    0  1  1  x

xMgX       1 1    1  1  -1  x

xH2OH      1 1    0  1  1  h

xvH        1 1    1  1  -1  h
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "xFeX" -> comp("Fe{2+}") / siteTotal("X"),
      "xMgX" -> comp("Mg{2+}") / siteTotal("X"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("xFeX"),
      "h" -> order("h"))
  }

  /** Ilmenite 'ilm_W24' — Weller et al. (2024); Mg on both sites, `m` a
    * genuine A+B-pool ratio, two independent order parameters (Q for Fe,
    * Qt for Ti) (reference: hpxeos/igneous/ilmenite.py). */
  object TcIlmeniteW24 extends Phase {
    val abbreviation = "ilm_W24"
    val sites = Seq(
      "A" -> Seq("Fe{2+}", "Ti{4+}", "Fe{3+}", "Mg{2+}"),
      "B" -> Seq("Fe{2+}", "Ti{4+}", "Fe{3+}", "Mg{2+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("oilm", "dilm", "hem", "ogk", "dgk")
    override val orderParameterNames = Seq("Q", "Qt")
    val mineral: MineralSpec =
      Metabasite.TcIlmeniteMixed.mineral.copy(name = "TC_ilm_W24")

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (ilm block).
    val pBlock = """
p(oilm)    1 1    0  1  1  Q

p(dilm)    2 1    0  2   1  i  -1  Q
             2    0  1  -1  i    0  1  1  m

p(hem)     1 1    1  1  -1  i

p(ogk)     1 1    0  2  -1  Q   1  Qt

p(dgk)     2 1    0  2   1  Q  -1  Qt
             2    0  1  1  i    0  1  1  m
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (ilm sf block).
    override val sfBlock = """
xFeA       2 1    0  2  1/2  i  1/2  Q
             2    0  1  -1/2  i    0  1  1  m

xTiA       1 1    0  2  1/2  i  -1/2  Qt

xFe3A      1 1    1  1  -1  i

xMgA       2 1    0  2  -1/2  Q  1/2  Qt
             2    0  1  1/2  i    0  1  1  m

xFeB       2 1    0  2  1/2  i  -1/2  Q
             2    0  1  -1/2  i    0  1  1  m

xTiB       1 1    0  2  1/2  i  1/2  Qt

xFe3B      1 1    1  1  -1  i

xMgB       2 1    0  2  1/2  Q  -1/2  Qt
             2    0  1  1/2  i    0  1  1  m
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Fe3" -> comp("Fe{3+}"))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "i" -> (lit(1.0) - sf("Fe3") / 2.0),
      "m" -> sf("Mg") / (sf("Fe") + sf("Mg")),
      "Q" -> order("Q"), "Qt" -> order("Qt"))
  }

  /** Orthopyroxene 'opx_W24' — Weller et al. (2024); adds Cr/Ti/Na
    * end-members (cren, obuf, ojd)
    * (reference: hpxeos/igneous/orthopyroxene.py). */
  object TcOrthopyroxeneW24 extends Phase {
    val abbreviation = "opx_W24"
    val sites = Seq(
      "M1" -> Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Fe{3+}", "Cr{3+}", "Ti{4+}"),
      "M2" -> Seq("Mg{2+}", "Fe{2+}", "Ca{2+}", "Na{+}"),
      "T" -> Seq("Si{4+}", "Al{3+}"))
    override val optionalColumns = Set("Fe{3+}")
    val endMemberNames = Seq("en", "fs", "fm", "odi", "mgts", "cren",
      "obuf", "mess", "ojd")
    override val orderParameterNames = Seq("Q")
    val mineral: MineralSpec =
      Metapelite.TcOrthopyroxene.mineral.copy(name = "TC_opx_W24")

    // Verbatim from tc-ig51NCKFMASHTOCr.txt (opx block).
    val pBlock = """
p(en)      6 1    1  5  -1  c  -1  j   1  Q  -1  x  -1  y
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  y

p(fs)      7 1    0  2   1  Q   1  x
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y

p(fm)      7 1    0  1  -2  Q
             2    0  1  2  j    0  1  1  Q
             2    0  1  -2  Q    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  2  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y

p(odi)     1 1    0  1  1  c

p(mgts)    1 1    0  4  -1  cr  -1  f   1  y  -2  t

p(cren)    1 1    0  1  1  cr

p(obuf)    1 1    0  1  2  t

p(mess)    1 1    0  1  1  f

p(ojd)     1 1    0  1  1  j
"""
    // Verbatim from tc-ig51NCKFMASHTOCr.txt (opx sf block).
    override val sfBlock = """
xMgM1      7 1    1  5  -1  j  -1  Q   1  t  -1  x  -1  y
             2    0  1  1  j    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  t    0  1  1  x
             2    0  1  1  Q    0  1  1  y
             2    0  1  1  x    0  1  1  y

xFeM1      7 1    0  2   1  Q   1  x
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  t    0  1  1  x
             2    0  1  -1  Q    0  1  1  y
             2    0  1  -1  x    0  1  1  y

xAlM1      1 1    0  5  -1  cr  -1  f   1  j   1  y  -2  t

xFe3M1     1 1    0  1  1  f

xCrM1      1 1    0  1  1  cr

xTiM1      1 1    0  1  1  t

xMgM2      6 1    1  4  -1  c  -1  j   1  Q  -1  x
             2    0  1  -1  j    0  1  1  Q
             2    0  1  1  Q    0  1  1  t
             2    0  1  1  c    0  1  1  x
             2    0  1  1  j    0  1  1  x
             2    0  1  -1  Q    0  1  1  y

xFeM2      6 1    0  2  -1  Q   1  x
             2    0  1  1  j    0  1  1  Q
             2    0  1  -1  Q    0  1  1  t
             2    0  1  -1  c    0  1  1  x
             2    0  1  -1  j    0  1  1  x
             2    0  1  1  Q    0  1  1  y

xCaM2      1 1    0  1  1  c

xNaM2      1 1    0  1  1  j

xSiT       1 1    1  1  -1/2  y

xAlT       1 1    0  1  1/2  y
"""

    def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)] = Seq(
      "Fe" -> comp("Fe{2+}"),
      "Mg" -> comp("Mg{2+}"),
      "Ca" -> comp("Ca{2+}"),
      "Na" -> comp("Na{+}"),
      "Fe3" -> comp("Fe{3+}"),
      "Ti" -> comp("Ti{4+}"),
      "Cr" -> comp("Cr{3+}"),
      "AlT" -> (lit(2.0) - comp("Si{4+}")))

    def variables(sf: String => Column, order: String => Column): Seq[(String, Column)] = Seq(
      "x" -> sf("Fe") / (sf("Fe") + sf("Mg")),
      "y" -> sf("AlT"),
      "c" -> sf("Ca"),
      "j" -> sf("Na"),
      "f" -> sf("Fe3"),
      "t" -> sf("Ti"),
      "cr" -> sf("Cr"),
      "Q" -> order("Q"))
  }

  val phases: Seq[Phase] =
    Seq(TcGarnetW24, TcClinopyroxeneW24, TcSpinelT21, TcOlivineH18,
      TcBiotiteG25, TcCordieriteG25, TcIlmeniteW24, TcOrthopyroxeneW24)
}
