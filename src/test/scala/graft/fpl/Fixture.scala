package graft.fpl

/** Synthetic replay fixture (FIXTURES.md A6): one match JSON + events in
  * spec order (docs/Specs.pdf p.2: match record first, then its events),
  * covering every branch of the metric algebra. */
object Fixture {

  val matchJson: String =
    """{"wyId":1001,"competitionId":1,"date":"May 20, 2018 at 8:45:00 PM GMT+2",
      |"dateutc":"2018-05-20 18:45:00","duration":"Regular","gameweek":1,
      |"label":"Alpha FC - Beta FC, 2 - 1","roundId":44,"seasonId":2018,
      |"status":"Played","venue":"Stadio Alpha","winner":100,
      |"teamsData":{
      | "100":{"hasFormation":1,"score":2,"scoreET":0,"scoreHT":1,"scoreP":0,
      |   "side":"home","teamId":100,"coachId":9001,
      |   "formation":{
      |     "lineup":[{"playerId":1,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"},
      |               {"playerId":2,"goals":"0","ownGoals":"0","yellowCards":"1","redCards":"0"},
      |               {"playerId":3,"goals":"1","ownGoals":"0","yellowCards":"0","redCards":"0"}],
      |     "bench":[{"playerId":4,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"},
      |              {"playerId":5,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}],
      |     "substitutions":[{"playerIn":4,"playerOut":3,"minute":60}]}},
      | "200":{"hasFormation":1,"score":1,"scoreET":0,"scoreHT":0,"scoreP":0,
      |   "side":"away","teamId":200,"coachId":9002,
      |   "formation":{
      |     "lineup":[{"playerId":11,"goals":"0","ownGoals":"1","yellowCards":"0","redCards":"0"},
      |               {"playerId":12,"goals":"1","ownGoals":"0","yellowCards":"0","redCards":"1"},
      |               {"playerId":13,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}],
      |     "bench":[{"playerId":14,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}],
      |     "substitutions":[]}}}}""".stripMargin.replaceAll("\n", "")

  /** Separate match (NOT in [[allLines]], so golden metric vectors are
    * untouched) pinning the spec-§1c edge: a starter subbed out at
    * exactly minute 90 played the whole match but does NOT count as
    * "never substituted" — absence from the substitution list is the
    * definition, not outMinute == 90. */
  val minute90MatchJson: String =
    """{"wyId":1002,"competitionId":1,"date":"May 21, 2018 at 8:45:00 PM GMT+2",
      |"dateutc":"2018-05-21 18:45:00","duration":"Regular","gameweek":2,
      |"label":"Gamma FC - Delta FC, 0 - 0","roundId":44,"seasonId":2018,
      |"status":"Played","venue":"Stadio Gamma","winner":0,
      |"teamsData":{
      | "300":{"hasFormation":1,"score":0,"scoreET":0,"scoreHT":0,"scoreP":0,
      |   "side":"home","teamId":300,"coachId":9003,
      |   "formation":{
      |     "lineup":[{"playerId":21,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"},
      |               {"playerId":22,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}],
      |     "bench":[{"playerId":23,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}],
      |     "substitutions":[{"playerIn":23,"playerOut":21,"minute":90}]}}}}"""
      .stripMargin.replaceAll("\n", "")

  private def ev(id: Int, eventId: Int, playerId: Int, teamId: Int,
      tags: Seq[Int], subEventId: Int = 0, matchId: Int = 1001): String = {
    val tagStr = tags.map(t => s"""{"id":$t}""").mkString(",")
    s"""{"id":$id,"eventId":$eventId,"eventName":"n","subEventId":$subEventId,
       |"subEventName":"s","matchId":$matchId,"matchPeriod":"1H",
       |"eventSec":${id * 10}.0,"playerId":$playerId,"teamId":$teamId,
       |"tags":[$tagStr],"positions":[{"x":50,"y":50},{"x":60,"y":60}]}"""
      .stripMargin.replaceAll("\n", "")
  }

  /** Events covering every metric branch (expected values in the specs
    * are hand-computed from these). */
  val eventJsons: Seq[String] = Seq(
    ev(1, 8, 1, 100, Seq(1801)),          // accurate normal pass
    ev(2, 8, 1, 100, Seq(1802)),          // inaccurate normal pass
    ev(3, 8, 1, 100, Seq(1801, 302)),     // accurate key pass
    ev(4, 8, 2, 100, Seq(302)),           // inaccurate key pass
    ev(5, 1, 2, 100, Seq(703)),           // duel won
    ev(6, 1, 2, 100, Seq(702)),           // neutral duel
    ev(7, 1, 11, 200, Seq(701)),          // duel lost
    ev(8, 10, 3, 100, Seq(1801, 101)),    // shot on target, goal
    ev(9, 10, 3, 100, Seq(1801)),         // shot on target, no goal
    ev(10, 10, 3, 100, Seq()),            // shot off target
    ev(11, 3, 12, 200, Seq(1801)),        // effective free kick
    ev(12, 3, 12, 200, Seq(101, 1801), subEventId = 35), // penalty scored
    ev(13, 2, 13, 200, Seq()),            // foul
    ev(14, 7, 11, 200, Seq(102)),         // own goal on a touch event (spec Q1)
    ev(15, 8, 4, 100, Seq(1801)))         // sub-on player accurate pass

  val allLines: Seq[String] = matchJson +: eventJsons

  val playersCsv: String =
    """name,birthArea,birthDate,foot,role,height,passportArea,weight,Id
      |Alice,X,1990-01-01,right,GK,190,X,80,1
      |Bob,X,1991-01-01,right,DF,185,X,78,2
      |Cara,X,1992-01-01,left,FW,175,X,70,3
      |Dan,X,1993-01-01,right,MD,180,X,75,4
      |Eve,X,1994-01-01,right,MD,178,X,74,5
      |Kim,X,1990-06-01,right,GK,191,X,81,11
      |Lou,X,1991-06-01,left,DF,184,X,79,12
      |Max,X,1992-06-01,right,FW,174,X,71,13
      |Ned,X,1993-06-01,right,MD,181,X,76,14""".stripMargin

  val teamsCsv: String =
    """name,Id
      |Alpha FC,100
      |Beta FC,200""".stripMargin
}
