package graft.sources

import graft.core.Position

/** REST/HTTP pagination strategies (cdf: crates/cdf-http/src/
  * pagination.rs:9-66 — Cursor, Page, Offset, LinkHeader, NextToken;
  * auto-detected and recorded in the plan).
  *
  * Transport-agnostic: `fetch` maps a request to (records, response
  * metadata); the paginator decides the next request and the typed
  * resume position. The driver loop collects page windows; each window
  * becomes one input partition of `spark.createDataFrame` (SURVEY
  * §2.1 REST row). Zero-egress environment → exercised against
  * in-memory fixtures in tests; the strategy logic is the product.
  */
object Paginators {

  final case class PageRequest(params: Map[String, String])
  final case class PageResponse(
      records: Seq[String],
      nextToken: Option[String] = None,
      linkNext: Option[String] = None,
      totalPages: Option[Int] = None)

  sealed trait Paginator {
    def name: String
    /** first request given an optional resume position. */
    def initial(resume: Option[Position]): PageRequest
    /** next request, or None when drained. */
    def next(req: PageRequest, resp: PageResponse): Option[PageRequest]
    /** typed position after a completed page. */
    def position(req: PageRequest, resp: PageResponse): Position
  }

  /** `?since=<cursor>` — cursor-param filter, fidelity Exact when the
    * source honors it (cdf driver.rs:696,1048,1081). */
  final case class CursorParam(param: String, extractCursor: Seq[String] => Option[Long])
      extends Paginator {
    def name = "cursor"
    def initial(resume: Option[Position]): PageRequest = resume match {
      case Some(Position.Cursor(_, v)) => PageRequest(Map(param -> v.toString))
      case _ => PageRequest(Map.empty)
    }
    def next(req: PageRequest, resp: PageResponse): Option[PageRequest] =
      if (resp.records.isEmpty) None
      else extractCursor(resp.records).map(c => PageRequest(Map(param -> c.toString)))
    def position(req: PageRequest, resp: PageResponse): Position =
      Position.Cursor(param, extractCursor(resp.records)
        .orElse(req.params.get(param).map(_.toLong)).getOrElse(0L))
  }

  /** `?page=N` with known/unknown page count. */
  final case class PageNumber(param: String = "page") extends Paginator {
    def name = "page"
    def initial(resume: Option[Position]): PageRequest = resume match {
      case Some(Position.PageToken(t)) => PageRequest(Map(param -> t))
      case _ => PageRequest(Map(param -> "1"))
    }
    def next(req: PageRequest, resp: PageResponse): Option[PageRequest] = {
      val cur = req.params(param).toInt
      val done = resp.records.isEmpty || resp.totalPages.exists(cur >= _)
      if (done) None else Some(PageRequest(Map(param -> (cur + 1).toString)))
    }
    def position(req: PageRequest, resp: PageResponse): Position =
      Position.PageToken(req.params(param))
  }

  /** `?offset=N&limit=M`. */
  final case class Offset(limit: Int) extends Paginator {
    def name = "offset"
    def initial(resume: Option[Position]): PageRequest = resume match {
      case Some(Position.Cursor(_, v)) =>
        PageRequest(Map("offset" -> v.toString, "limit" -> limit.toString))
      case _ => PageRequest(Map("offset" -> "0", "limit" -> limit.toString))
    }
    def next(req: PageRequest, resp: PageResponse): Option[PageRequest] =
      if (resp.records.length < limit) None
      else Some(PageRequest(Map(
        "offset" -> (req.params("offset").toInt + limit).toString,
        "limit" -> limit.toString)))
    def position(req: PageRequest, resp: PageResponse): Position =
      Position.Cursor("offset", req.params("offset").toLong + resp.records.length)
  }

  /** RFC5988 `Link: <...>; rel="next"`. */
  case object LinkHeader extends Paginator {
    def name = "link_header"
    def initial(resume: Option[Position]): PageRequest = resume match {
      case Some(Position.PageToken(url)) => PageRequest(Map("url" -> url))
      case _ => PageRequest(Map("url" -> ""))
    }
    def next(req: PageRequest, resp: PageResponse): Option[PageRequest] =
      resp.linkNext.map(u => PageRequest(Map("url" -> u)))
    def position(req: PageRequest, resp: PageResponse): Position =
      Position.PageToken(resp.linkNext.getOrElse(""))
  }

  /** Opaque `next_token` continuation. */
  case object NextToken extends Paginator {
    def name = "next_token"
    def initial(resume: Option[Position]): PageRequest = resume match {
      case Some(Position.PageToken(t)) if t.nonEmpty => PageRequest(Map("token" -> t))
      case _ => PageRequest(Map.empty)
    }
    def next(req: PageRequest, resp: PageResponse): Option[PageRequest] =
      resp.nextToken.map(t => PageRequest(Map("token" -> t)))
    def position(req: PageRequest, resp: PageResponse): Position =
      Position.PageToken(resp.nextToken.getOrElse(""))
  }

  /** Auto-detection from the first response's shape, recorded into the
    * plan (cdf pagination.rs: detected paginator is plan evidence). */
  def detect(first: PageResponse, offsetLimit: Int = 100): Paginator =
    if (first.nextToken.isDefined) NextToken
    else if (first.linkNext.isDefined) LinkHeader
    else if (first.totalPages.isDefined) PageNumber()
    else Offset(offsetLimit)

  /** Drive a paginator to quiescence (bounded by maxPages). Returns
    * page record-windows + the final typed position. */
  def drain(p: Paginator, fetch: PageRequest => PageResponse,
      resume: Option[Position], maxPages: Int = 10000): (Seq[Seq[String]], Option[Position]) = {
    var req = p.initial(resume)
    var pos: Option[Position] = None
    val pages = Seq.newBuilder[Seq[String]]
    var n = 0
    var continue = true
    while (continue && n < maxPages) {
      val resp = fetch(req)
      if (resp.records.nonEmpty) pages += resp.records
      pos = Some(p.position(req, resp))
      p.next(req, resp) match {
        case Some(r) => req = r; n += 1
        case None => continue = false
      }
    }
    (pages.result(), pos)
  }
}
