require "json"

module EventQL; end

class EventQL::Query
  def initialize(client, query_str, opts = {})
    @client = client
    @query_str = query_str
    @opts = opts
  end

  # Returns the parsed result list:
  #   [{"type" => "table", "columns" => [...], "rows" => [...]}, ...]
  def execute!
    payload = { "query" => @query_str, "format" => "json" }
    payload["database"] = @client.database if @client.database
    response = @client.post("/api/v1/sql", payload)
    body = JSON.parse(response.body)
    unless response.code.to_i == 200
      raise "QUERY ERROR: #{body["error"] || response.body[0..128]}"
    end
    body["results"]
  end

  # Convenience: rows of the first result table.
  def rows!
    execute!.first["rows"]
  end
end
