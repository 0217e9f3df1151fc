package graft.signals

import graft.domain.Signal

/** Signal routing — rebuild of /root/reference/models/signal_router.py:
  * 68-479: a TS-primary route with an ordered fallback chain, per-route
  * feature flags, and routing statistics. The reference's LLM fallback
  * route is represented by the same `Route` abstraction (no LLM exists in
  * this environment; any generator pluggable here).
  */
object SignalRouter {

  trait Route {
    def name: String
    def enabled: Boolean
    def generate(ticker: String): Option[Signal]
  }

  final case class RouteStats(attempts: Map[String, Long], served: Map[String, Long])

  final class Router(routes: Seq[Route]) {
    private val attempts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    private val served = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)

    /** First enabled route that yields a signal wins; HOLD-everything
      * fallback if none does (never returns no decision). */
    def route(ticker: String): (Signal, String) = {
      routes.filter(_.enabled).foreach { r =>
        attempts(r.name) += 1
        r.generate(ticker) match {
          case Some(sig) =>
            served(r.name) += 1
            return (sig, r.name)
          case None => ()
        }
      }
      served("default_hold") += 1
      (Signal(ticker, new java.sql.Timestamp(0L), "HOLD", 0.0, 0.0, 0.0,
        0.0, 0.0, 0.0, "NO_ROUTE_AVAILABLE"), "default_hold")
    }

    def stats: RouteStats = RouteStats(attempts.toMap, served.toMap)
  }
}
