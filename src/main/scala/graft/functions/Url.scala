package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction — provenance
  * work in a real corpus starts from URLs, and per-source governance
  * (tx18/tx30) wants a stable per-DOMAIN key, not the raw string with
  * its case/port/fragment noise. Everything is a codegen regexp/string
  * expression chain (the tx12/Html discipline — no UDF), RE2-safe and
  * mirrored 1:1 into generated DuckDB SQL for the oracle.
  *
  * Canonical form: lowercase scheme and host, userinfo stripped from
  * the authority before the host/port split (round-17 ADVICE: a
  * `user:pass@` prefix must never register 'user' as the host),
  * IPv6 literals (`[...]`) kept whole, default port stripped (80 for
  * http, 443 for https — non-default ports kept), fragment stripped,
  * path and query preserved verbatim (path case is
  * server-significant; query-param reordering is corpus policy, not
  * canonicalization). Malformed rows (no `scheme://`) pass through
  * lowercased-host-less — fail-soft, the rollup buckets them under
  * their own string rather than dropping provenance.
  *
  * Registered domain: the publicsuffix.org algorithm over a STATIC
  * snapshot of the list (public data, [[PublicSuffixes]] /
  * [[WildcardSuffixes]] / [[ExceptionRules]] — ~600 well-known rules
  * incl. every ccTLD, the major gTLDs, the big ccSLD families, the
  * classic wildcard TLDs with their `!` exceptions, and the common
  * private-section hosting suffixes; regenerate from the live PSL file
  * per deployment). Exceptions win, then the LONGEST matching rule
  * (wildcard `*.x` matches base + any one label); the registered
  * domain is the prevailing public suffix plus one label. A host that
  * IS a bare suffix, an IP literal, or matches nothing registers as
  * itself (fail-soft — same doctrine as canonicalize).
  *
  * Scale shape: rule membership is 4 map-literal lookups per row
  * (last-k-label slices against a broadcast map — the Gender-map
  * treatment), NOT a per-suffix regex chain: a 600-rule chain would
  * run 600 regex machines per row across a 100 TB scan; the slice
  * form is O(maxRuleLabels) regardless of list size. */
object Url {

  /** NORMAL rules of the PSL snapshot (no leading `*.`/`!`). Grouped
    * for review; membership is by exact label-suffix match so order
    * is irrelevant. */
  val PublicSuffixes: Seq[String] = Seq(
    // ICANN gTLDs + common new gTLDs
    "com", "org", "net", "edu", "gov", "int", "mil", "arpa", "info",
    "biz", "name", "pro", "aero", "asia", "cat", "coop", "jobs", "mobi",
    "museum", "post", "tel", "travel", "xxx", "app", "dev", "page",
    "art", "blog", "cloud", "club", "design", "online", "shop", "site",
    "store", "tech", "xyz", "space", "website", "live", "news",
    // ccTLDs (single-label; wildcard-governed TLDs live in
    // WildcardSuffixes instead)
    "ac", "ad", "ae", "af", "ag", "ai", "al", "am", "ao", "aq", "ar",
    "as", "at", "au", "aw", "ax", "az", "ba", "bb", "be", "bf", "bg",
    "bh", "bi", "bj", "bm", "bn", "bo", "br", "bs", "bt", "bw", "by",
    "bz", "ca", "cc", "cd", "cf", "cg", "ch", "ci", "cl", "cm", "cn",
    "co", "cr", "cu", "cv", "cw", "cx", "cy", "cz", "de", "dj", "dk",
    "dm", "do", "dz", "ec", "ee", "eg", "es", "et", "eu", "fi", "fj",
    "fm", "fo", "fr", "ga", "gd", "ge", "gf", "gg", "gh", "gi", "gl",
    "gm", "gn", "gp", "gq", "gr", "gs", "gt", "gw", "gy", "hk", "hn",
    "hr", "ht", "hu", "id", "ie", "il", "im", "in", "io", "iq", "ir",
    "is", "it", "je", "jo", "jp", "ke", "kg", "ki", "km", "kn", "kp",
    "kr", "kw", "ky", "kz", "la", "lb", "lc", "li", "lk", "lr", "ls",
    "lt", "lu", "lv", "ly", "ma", "mc", "md", "me", "mg", "mk", "ml",
    "mn", "mo", "mq", "mr", "ms", "mt", "mu", "mv", "mw", "mx", "my",
    "mz", "na", "nc", "ne", "nf", "ng", "ni", "nl", "no", "nr", "nu",
    "nz", "om", "pa", "pe", "pf", "ph", "pk", "pl", "pm", "pn", "pr",
    "ps", "pt", "pw", "py", "qa", "re", "ro", "rs", "ru", "rw", "sa",
    "sb", "sc", "sd", "se", "sg", "sh", "si", "sk", "sl", "sm", "sn",
    "so", "sr", "ss", "st", "su", "sv", "sx", "sy", "sz", "tc", "td",
    "tf", "tg", "th", "tj", "tk", "tl", "tm", "tn", "to", "tr", "tt",
    "tv", "tw", "tz", "ua", "ug", "us", "uy", "uz", "va", "vc", "ve",
    "vg", "vi", "vn", "vu", "wf", "ws", "ye", "yt", "za", "zm", "zw",
    // ccSLD families (the big registries' second-level namespaces)
    "co.uk", "gov.uk", "ac.uk", "org.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br", "eco.br", "eng.br", "ind.br",
    "inf.br", "jus.br", "leg.br", "med.br", "mus.br", "pro.br",
    "radio.br", "rec.br", "srv.br", "taxi.br", "tur.br", "tv.br",
    "vet.br", "wiki.br",
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn",
    "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn",
    "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn", "xj.cn",
    "xz.cn", "yn.cn", "zj.cn",
    "co.in", "firm.in", "net.in", "org.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar", "tur.ar",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
    "busan.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "mil.tw", "club.tw", "ebiz.tw", "game.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "net.il", "org.il",
    "com.ru", "net.ru", "org.ru", "ac.ru", "edu.ru", "gov.ru",
    "int.ru", "mil.ru",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl",
    "info.pl", "biz.pl", "waw.pl", "warszawa.pl", "wroc.pl",
    "krakow.pl", "poznan.pl", "gda.pl", "shop.pl", "sklep.pl",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "name.tr", "net.tr",
    "org.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "gov.it", "edu.it",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
    "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
    "city.hu", "shop.hu", "suli.hu", "news.hu",
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    "al.us", "ak.us", "az.us", "ar.us", "ca.us", "co.us", "ct.us",
    "dc.us", "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us",
    "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us", "md.us",
    "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us", "nc.us",
    "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us", "ny.us",
    "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
    "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
    "wv.us", "wy.us",
    // PSL private section — hosting platforms whose subdomains are
    // independently registrable (per-domain governance MUST split them)
    "github.io", "githubusercontent.com", "gitlab.io", "herokuapp.com",
    "appspot.com", "blogspot.com", "cloudfront.net", "netlify.app",
    "vercel.app", "web.app", "firebaseapp.com", "azurewebsites.net",
    "wordpress.com", "pages.dev", "workers.dev", "s3.amazonaws.com")

  /** Bases of `*.x` WILDCARD rules: base + ANY one label is a public
    * suffix (so the registered domain under it keeps TWO labels past
    * the base). The classic wildcard ccTLDs + the Japanese city
    * namespaces. */
  val WildcardSuffixes: Seq[String] = Seq(
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** `!x` EXCEPTION rules (stored without the `!`): the rule itself IS
    * the registrable domain, overriding any wildcard that would cover
    * it. */
  val ExceptionRules: Seq[String] = Seq(
    "www.ck", "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** Longest effective public-suffix label count the snapshot can
    * produce: max normal-rule labels vs max wildcard-base labels + 1. */
  val MaxSuffixLabels: Int =
    (PublicSuffixes.map(labelCount) ++ WildcardSuffixes.map(labelCount(_) + 1)).max

  private def labelCount(s: String): Int = s.count(_ == '.') + 1

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  // host = bracketed IPv6 literal, or everything before the port colon
  private val HostOfAuthRe = "^(\\[[^\\]]*\\]|[^:]*)"
  private val PortOfAuthRe = "^(?:\\[[^\\]]*\\]|[^:]*):([0-9]+)$"

  /** Lowercased scheme ('' when the string has no `scheme://`). */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Authority with any `userinfo@` prefix stripped — the host/port
    * split must never see `user:pass` (round-17 ADVICE). */
  private def authority(url: Column): Column =
    regexp_replace(regexp_extract(url, HostPortRe, 1), "^[^@]*@", "")

  /** Lowercased host without the port ('' when malformed). IPv6
    * literals stay bracketed-whole (`[2001:db8::1]`). */
  def host(url: Column): Column =
    lower(regexp_extract(authority(url), HostOfAuthRe, 1))

  private def port(url: Column): Column =
    regexp_extract(authority(url), PortOfAuthRe, 1)

  /** Path + query with the fragment stripped (may be ''). */
  private def rest(url: Column): Column =
    regexp_replace(
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
      "#.*$", "")

  /** Canonical URL (see object doc). Malformed input → lowercased
    * whole string (still a stable rollup key). */
  def canonicalize(url: Column): Column = {
    val s = scheme(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !((s === "http" && p === "80") || (s === "https" && p === "443"))
    when(s === "", lower(url))
      .otherwise(concat(s, lit("://"), host(url),
        when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
        rest(url)))
  }

  // Rule membership as ONE broadcast map literal per rule class: a
  // last-k-label slice can only equal a k-label rule, so a single map
  // across lengths is unambiguous.
  private lazy val normalSet: Column =
    typedLit(PublicSuffixes.map(_ -> true).toMap)
  private lazy val wildcardSet: Column =
    typedLit(WildcardSuffixes.map(_ -> true).toMap)
  private lazy val exceptionSet: Column =
    typedLit(ExceptionRules.map(_ -> true).toMap)

  private def inSet(set: Column, s: Column): Column =
    coalesce(element_at(set, s), lit(false))

  /** Registered domain of a lowercase host under the PSL algorithm
    * (see object doc). Pure expression: label split + ≤ MaxSuffixLabels
    * slice/lookup rounds, no regex per rule. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    // last k labels re-joined; caller guards n >= k
    def sfx(k: Int): Column = array_join(slice(labels, -k, k), ".")
    val excLens = ExceptionRules.map(labelCount).distinct.sorted.reverse
    val exc = excLens.foldLeft(lit(null).cast("string")) { (acc, k) =>
      coalesce(acc, when(n >= k && inSet(exceptionSet, sfx(k)), sfx(k)))
    }
    val reg = (MaxSuffixLabels to 1 by -1)
      .foldLeft(lit(null).cast("string")) { (acc, l) =>
        val normalHit = when(n >= l + 1, inSet(normalSet, sfx(l)))
        val wildcardHit =
          if (l >= 2) when(n >= l + 1, inSet(wildcardSet, sfx(l - 1)))
          else lit(false)
        coalesce(acc,
          when(coalesce(normalHit, lit(false)) ||
            coalesce(wildcardHit, lit(false)), sfx(l + 1)))
      }
    coalesce(exc, reg, hostCol)
  }

  // ------------------------------------------------------------------
  // Oracle mirrors (generated DuckDB SQL over a column expression)

  def schemeSql(e: String): String =
    s"lower(coalesce(regexp_extract($e, '$SchemeRe', 1), ''))"

  private def authoritySql(e: String): String =
    s"regexp_replace(coalesce(regexp_extract($e, '$HostPortRe', 1), ''), '^[^@]*@', '')"

  def hostSql(e: String): String =
    s"lower(coalesce(regexp_extract(${authoritySql(e)}, '$HostOfAuthRe', 1), ''))"

  private def portSql(e: String): String =
    s"coalesce(regexp_extract(${authoritySql(e)}, '$PortOfAuthRe', 1), '')"

  private def restSql(e: String): String =
    s"regexp_replace(regexp_replace($e, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$$', '')"

  def canonicalizeSql(e: String): String = {
    val s = schemeSql(e); val p = portSql(e)
    s"""CASE WHEN $s = '' THEN lower($e)
        ELSE $s || '://' || ${hostSql(e)} ||
          (CASE WHEN $p <> '' AND NOT (($s = 'http' AND $p = '80') OR
                                       ($s = 'https' AND $p = '443'))
                THEN ':' || $p ELSE '' END) || ${restSql(e)} END"""
  }

  /** The PSL algorithm as generated SQL: label-list slices against
    * per-length IN lists (a k-label slice only needs the k-label
    * rules). `hostE` must be a bare column reference — it is spliced
    * repeatedly. */
  def registeredDomainSql(hostE: String): String = {
    def inList(rules: Seq[String]): String =
      rules.sorted.map(r => s"'$r'").mkString("(", ", ", ")")
    val byLen = PublicSuffixes.groupBy(labelCount)
    val wByLen = WildcardSuffixes.groupBy(labelCount)
    // inlined per occurrence (no correlated subquery — DuckDB clamps
    // negative list slices, and the explicit len() guard makes the
    // clamp unreachable, mirroring the engine's n >= k guard)
    val labs = s"string_split($hostE, '.')"
    val n = s"len($labs)"
    def sfx(k: Int) = s"array_to_string($labs[-$k:], '.')"
    val excArms = ExceptionRules.map(labelCount).distinct.sorted.reverse
      .map { k =>
        val rules = ExceptionRules.filter(labelCount(_) == k)
        s"WHEN $n >= $k AND ${sfx(k)} IN ${inList(rules)} THEN ${sfx(k)}"
      }
    val ruleArms = (MaxSuffixLabels to 1 by -1).flatMap { l =>
      val normals = byLen.getOrElse(l, Nil)
      val wilds = if (l >= 2) wByLen.getOrElse(l - 1, Nil) else Nil
      val preds = Seq(
        if (normals.nonEmpty) Some(s"${sfx(l)} IN ${inList(normals)}") else None,
        if (wilds.nonEmpty) Some(s"${sfx(l - 1)} IN ${inList(wilds)}") else None
      ).flatten
      if (preds.isEmpty) None
      else Some(s"WHEN $n >= ${l + 1} AND (${preds.mkString(" OR ")}) THEN ${sfx(l + 1)}")
    }
    val arms = (excArms ++ ruleArms).mkString("\n      ")
    s"(CASE $arms ELSE $hostE END)"
  }
}
