package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-Suffix-List registered-domain extraction — the exact eTLD+1
  * [[UrlOps.registeredDomain]]'s regexp heuristic approximates.
  *
  * The PSL (publicsuffix.org — a public dataset) is three rule kinds:
  * exact suffixes (`co.uk`), wildcards (`*.ck` — any single label under
  * the base is a public suffix), and exceptions (`!www.ck` — registrable
  * despite a covering wildcard). Matching: the rule with the MOST labels
  * prevails, exceptions take priority, and a host matching no rule uses
  * its last label (the implicit `*` rule). The registered domain is the
  * public suffix plus one label; a host that IS a public suffix has none.
  *
  * [[Rules]] is an embedded curated snapshot of the list's stable core
  * (the multi-label country registries plus the wildcard/exception
  * families) — swap the Seq for a full refresh of the published dat file
  * when currency matters; nothing else changes. Bounds enforced here:
  * exact/exception rules ≤ 3 labels, wildcard bases ≤ 2 (true of the
  * snapshot, checked at class init) — so matching needs only the host's
  * last three label-tails.
  *
  * Scale shape ([[registeredDomainPsl]]): the rules table is a few
  * hundred rows → it BROADCASTS, and each host row LEFT-joins its three
  * trailing label-tails against it map-side — three broadcast hash
  * joins, zero shuffles, no per-host explode/re-aggregate. The
  * longest-match/exception-priority resolution is one codegen'd
  * expression over the matched flags. The DuckDB oracle twin
  * ([[registeredDomainPslOracleSql]]) mirrors the same rules as a VALUES
  * relation and the same tail algebra, so PSL semantics are
  * hash-verifiable, not a doc claim. */
object PublicSuffix {

  /** (rule, isException, isWildcard) — wildcards carry the BASE (the X
    * of `*.X`). Curated snapshot of the PSL's stable core. */
  val Rules: Seq[(String, Boolean, Boolean)] = {
    val exact = Seq(
      // United Kingdom
      "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
      "ac.uk", "gov.uk", "nhs.uk", "police.uk",
      // Australia
      "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
      // Japan (prefecture/city forms are in the wildcard family below)
      "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
      "gr.jp", "lg.jp",
      // Brazil
      "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
      "blog.br", "eco.br", "emp.br", "esp.br", "eti.br", "far.br",
      "flog.br", "fnd.br", "fot.br", "fst.br", "g12.br", "ggf.br",
      "imb.br", "ind.br", "inf.br", "jor.br", "jus.br", "lel.br",
      "mat.br", "med.br", "mus.br", "not.br", "ntr.br", "odo.br",
      "pro.br", "psc.br", "psi.br", "qsl.br", "rec.br", "slg.br",
      "srv.br", "tmp.br", "trd.br", "tur.br", "tv.br", "vet.br",
      "vlog.br", "wiki.br", "zlg.br",
      // China
      "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "mil.cn",
      "ac.cn", "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn",
      "gx.cn", "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn",
      "hn.cn", "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn",
      "qh.cn", "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn",
      "xj.cn", "xz.cn", "yn.cn", "zj.cn",
      // India
      "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
      "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
      // Mexico, New Zealand, South Africa
      "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
      "co.nz", "net.nz", "org.nz", "ac.nz", "geek.nz", "gen.nz",
      "govt.nz", "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz",
      "school.nz", "cri.nz",
      "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za", "edu.za",
      "law.za", "mil.za", "nom.za", "school.za",
      // Korea, Taiwan, Turkey
      "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
      "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
      "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
      "game.tw", "ebiz.tw", "club.tw",
      "com.tr", "net.tr", "org.tr", "info.tr", "biz.tr", "av.tr",
      "bbs.tr", "bel.tr", "dr.tr", "edu.tr", "gen.tr", "gov.tr",
      "k12.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
      // Argentina, Venezuela, Colombia
      "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
      "mil.ar", "musica.ar", "tur.ar",
      "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve",
      "info.ve", "mil.ve", "web.ve",
      "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
      "nom.co", "arts.co", "firm.co", "info.co", "int.co", "rec.co",
      "web.co",
      // South-east Asia
      "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
      "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
      "name.my",
      "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
      "ngo.ph", "i.ph",
      "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
      "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
      "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
      "com.id", "net.id", "org.id", "ac.id", "biz.id", "co.id",
      "desa.id", "go.id", "mil.id", "my.id", "or.id", "ponpes.id",
      "sch.id", "web.id",
      // Middle East / Africa
      "com.eg", "net.eg", "org.eg", "edu.eg", "eun.eg", "gov.eg",
      "mil.eg", "name.eg", "sci.eg",
      "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
      "pub.sa", "sch.sa",
      "co.il", "org.il", "net.il", "ac.il", "gov.il", "idf.il",
      "k12.il", "muni.il",
      "com.pk", "net.pk", "org.pk", "edu.pk", "fam.pk", "biz.pk",
      "web.pk", "gov.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk",
      "gos.pk", "info.pk",
      "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
      "mobi.ke", "info.ke",
      "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
      "mil.ng", "mobi.ng", "name.ng", "sch.ng",
      "co.tz", "ac.tz", "go.tz", "hotel.tz", "info.tz", "me.tz",
      "mil.tz", "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
      // Europe (multi-label registries)
      "com.pl", "net.pl", "org.pl", "info.pl", "waw.pl", "gov.pl",
      "edu.pl", "biz.pl",
      "com.ru", "net.ru", "org.ru", "int.ru", "ac.ru", "edu.ru",
      "gov.ru", "mil.ru",
      "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
      "kiev.ua", "lviv.ua", "od.ua", "dp.ua", "kh.ua",
      "co.at", "or.at", "ac.at", "gv.at", "priv.at",
      "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt",
      "nome.pt", "publ.pt",
      "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
      "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
      "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
      "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
      "2000.hu", "agrar.hu", "bolt.hu", "casino.hu", "city.hu",
      "erotica.hu", "erotika.hu", "film.hu", "forum.hu", "games.hu",
      "hotel.hu", "ingatlan.hu", "jogasz.hu", "konyvelo.hu",
      "lakas.hu", "media.hu", "news.hu", "reklam.hu", "sex.hu",
      "shop.hu", "suli.hu", "szex.hu", "tozsde.hu", "utazas.hu",
      "video.hu",
      // Americas
      "co.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
      "com.ec", "net.ec", "org.ec", "edu.ec", "fin.ec", "gob.ec",
      "gov.ec", "info.ec", "k12.ec", "med.ec", "mil.ec", "pro.ec",
      "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
      "nom.pe",
      "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
      "com.py", "net.py", "org.py", "coop.py", "edu.py", "gov.py",
      "mil.py", "una.py",
      "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo",
      "mil.bo", "tv.bo", "web.bo",
      "com.do", "net.do", "org.do", "art.do", "edu.do", "gob.do",
      "gov.do", "mil.do", "sld.do", "web.do",
      "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt",
      "mil.gt",
      "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
      "com.pa", "net.pa", "org.pa", "abo.pa", "ac.pa", "edu.pa",
      "gob.pa", "ing.pa", "med.pa", "nom.pa", "sld.pa",
      // misc well-known
      "co.com", "us.com", "uk.com", "eu.com", "gb.com", "de.com",
      "jpn.com", "ru.com", "sa.com", "se.com", "za.com", "br.com",
      "cn.com", "hu.com", "no.com", "qc.com", "uy.com",
      "co.us", "isa.us", "nsn.us", "dni.us", "fed.us",
      "gc.ca", "co.ca")
    val wildcards = Seq( // *.X bases (none may also carry exact X rules)
      "ck", "er", "fk", "mm", "np", "bd", "jm", "kh", "mv", "pg", "ye",
      "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
      "sapporo.jp", "sendai.jp", "yokohama.jp")
    val exceptions = Seq(
      "www.ck", "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
      "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
      "city.yokohama.jp")
    exact.map((_, false, false)) ++ wildcards.map((_, false, true)) ++
      exceptions.map((_, true, false))
  }

  require(Rules.map(_._1).distinct.size == Rules.size, "duplicate PSL rules")
  require(Rules.forall { case (r, exc, wild) =>
    val n = r.split('.').length
    if (wild) n <= 2 else n <= 3
  }, "snapshot bound: exact/exception rules <= 3 labels, wildcard bases <= 2")

  /** The snapshot as a relation (rule, is_exc, is_wild) — broadcast-sized
    * by construction. */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Rules.toDF("rule", "is_exc", "is_wild")
  }

  private def tailOf(labels: Column, n: Column, k: Int): Column =
    when(n >= k, array_join(slice(labels, -k, k), "."))

  /** PSL registered domain (eTLD+1) of a lower-case `hostCol`, appended
    * as `outCol`. '' when the host has no dot, matches no registrable
    * form, or IS a public suffix itself. Three broadcast LEFT joins (one
    * per trailing label-tail) + one resolution expression — map-side
    * end to end, the host stream is never shuffled. */
  def registeredDomainPsl(df: DataFrame, hostCol: String,
                          outCol: String = "domain"): DataFrame = {
    val scratch = Seq("__n", "__t1", "__t2", "__t3",
      "__exc1", "__exc2", "__exc3", "__wild1", "__wild2", "__wild3")
    require((scratch :+ outCol).forall(c => !df.columns.contains(c)),
      s"input already carries '$outCol' or a __-scratch column")
    val spark = df.sparkSession
    val rules = rulesDf(spark)
    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    var out = df
      .withColumn("__n", n)
      .withColumn("__t1", tailOf(labels, n, 1))
      .withColumn("__t2", tailOf(labels, n, 2))
      .withColumn("__t3", tailOf(labels, n, 3))
    for (k <- 1 to 3) {
      val r = rules.select(col("rule").as(s"__t$k"),
        col("is_exc").as(s"__exc$k"), col("is_wild").as(s"__wild$k"))
      out = out.join(broadcast(r), Seq(s"__t$k"), "left")
    }
    // public-suffix label count by PSL precedence: exceptions first
    // (their suffix is the rule minus its first label), then the
    // longest match — a wildcard base matched at tail k puts the
    // suffix at k+1 labels — then the implicit '*' (1 label)
    def flag(c: String): Column = coalesce(col(c), lit(false))
    def matched(k: Int): Column = col(s"__exc$k").isNotNull
    // a wildcard rule `*.X` has labels(X)+1 labels and so can only
    // match hosts with at least that many — a host EQUAL to the base
    // falls through to the implicit '*' (host 'kawasaki.jp' registers
    // as kawasaki.jp under rule 'jp'; it is not itself a suffix)
    val psLen =
      when(flag("__exc3"), lit(2))
        .when(flag("__exc2"), lit(1))
        .otherwise(greatest(
          when(matched(3) && !flag("__exc3"), 3).otherwise(0), // exact, 3 labels
          when(flag("__wild2") && col("__n") >= 3, 3)
            .otherwise(0), // one label under a 2-label base
          when(matched(2) && !flag("__exc2") && !flag("__wild2"), 2)
            .otherwise(0), // exact, 2 labels
          when(flag("__wild1") && col("__n") >= 2, 2).otherwise(0),
          when(matched(1) && !flag("__exc1") && !flag("__wild1"), 1)
            .otherwise(0),
          lit(1))) // the PSL's implicit '*' rule: unknown TLDs count 1
    val reg = when(col("__n") >= psLen + 1,
      array_join(slice(split(col(hostCol), "\\."),
        (psLen + 1) * -1, psLen + 1), "."))
      .otherwise(lit(""))
    // IP literals are hosts but never registrable names (PSL rule):
    // all-numeric dotted hosts (IPv4) and anything carrying ':'
    // (unbracketed IPv6) have no registered domain
    val isIp = col(hostCol).rlike("^[0-9.]+$") ||
      col(hostCol).contains(":")
    out.withColumn(outCol, when(col(hostCol).isNull, lit(null)
        .cast("string")).when(isIp, lit("")).otherwise(reg))
      .drop("__n", "__t1", "__t2", "__t3",
        "__exc1", "__exc2", "__exc3", "__wild1", "__wild2", "__wild3")
  }

  /** Per-registered-domain stats over raw URLs, PSL-exact — the
    * [[UrlOps.domainStats]] aggregate with [[registeredDomainPsl]] as
    * the key. One broadcast-joined projection + one hash aggregate. */
  def domainStatsPsl(df: DataFrame, urlCol: String,
                     charsCol: String): DataFrame =
    registeredDomainPsl(
      df.withColumn("__host", UrlOps.hostOf(col(urlCol))), "__host")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol).cast("long")).as("n_chars"))

  /** [[registeredDomainPsl]] as DuckDB SQL over a relation exposing a
    * lower-case `hostExpr`: the SAME snapshot rules as a VALUES
    * relation, the same three trailing tails, the same precedence
    * resolution. Emits WITH bodies; the final relation is
    * `psl_reg(host, domain)` keyed by DISTINCT host. */
  def registeredDomainPslOracleCtes(hostExpr: String,
                                    fromRelation: String): String = {
    val vals = Rules.map { case (r, e, w) =>
      s"('${r.replace("'", "''")}', $e, $w)"
    }.mkString(", ")
    s"""psl_rules(rule, is_exc, is_wild) AS (VALUES $vals),
       |psl_hosts AS (SELECT DISTINCT $hostExpr AS host FROM $fromRelation),
       |psl_tails AS (SELECT host,
       |    string_split(host, '.') AS L, len(string_split(host, '.')) AS n
       |  FROM psl_hosts),
       |psl_m AS (SELECT t.host, t.n,
       |    CASE WHEN t.n >= 1
       |      THEN array_to_string(list_slice(L, -1, -1), '.') END AS t1,
       |    CASE WHEN t.n >= 2
       |      THEN array_to_string(list_slice(L, -2, -1), '.') END AS t2,
       |    CASE WHEN t.n >= 3
       |      THEN array_to_string(list_slice(L, -3, -1), '.') END AS t3
       |  FROM psl_tails t),
       |psl_j AS (SELECT m.host, m.n,
       |    r1.is_exc AS exc1, r1.is_wild AS wild1, r1.rule AS m1,
       |    r2.is_exc AS exc2, r2.is_wild AS wild2, r2.rule AS m2,
       |    r3.is_exc AS exc3, r3.is_wild AS wild3, r3.rule AS m3
       |  FROM psl_m m
       |  LEFT JOIN psl_rules r1 ON m.t1 = r1.rule
       |  LEFT JOIN psl_rules r2 ON m.t2 = r2.rule
       |  LEFT JOIN psl_rules r3 ON m.t3 = r3.rule),
       |psl_len AS (SELECT host, n,
       |    CASE WHEN COALESCE(exc3, false) THEN 2
       |         WHEN COALESCE(exc2, false) THEN 1
       |         ELSE greatest(
       |           CASE WHEN m3 IS NOT NULL AND NOT COALESCE(exc3, false)
       |             THEN 3 ELSE 0 END,
       |           CASE WHEN COALESCE(wild2, false) AND n >= 3
       |             THEN 3 ELSE 0 END,
       |           CASE WHEN m2 IS NOT NULL AND NOT COALESCE(exc2, false)
       |             AND NOT COALESCE(wild2, false) THEN 2 ELSE 0 END,
       |           CASE WHEN COALESCE(wild1, false) AND n >= 2
       |             THEN 2 ELSE 0 END,
       |           CASE WHEN m1 IS NOT NULL AND NOT COALESCE(exc1, false)
       |             AND NOT COALESCE(wild1, false) THEN 1 ELSE 0 END,
       |           1) END AS ps_len
       |  FROM psl_j),
       |psl_reg AS (SELECT host,
       |    CASE WHEN regexp_matches(host, '^[0-9.]+$$')
       |        OR contains(host, ':') THEN ''
       |      WHEN n >= ps_len + 1 THEN array_to_string(list_slice(
       |      string_split(host, '.'), -(ps_len + 1), -1), '.') ELSE '' END
       |      AS domain
       |  FROM psl_len)""".stripMargin
  }
}
