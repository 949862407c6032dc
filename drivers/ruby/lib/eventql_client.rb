require "net/http"
require "json"

module EventQL; end

# EventQL::Client.new(host: "localhost", port: 9175,
#                     database: "default", auth_token: "...",
#                     user: "...", password: "...")
class EventQL::Client
  def initialize(opts = {})
    @opts = opts
  end

  def query(query_str, opts = {})
    EventQL::Query.new(self, query_str, opts)
  end

  # rows: [{table: "t", data: {...}}, ...]
  def insert!(rows)
    response = post("/api/v1/tables/insert", rows)
    unless response.code.to_i == 201
      raise "HTTP ERROR (#{response.code}): #{response.body[0..128]}"
    end
    true
  end

  def create_table!(table, columns, primary_key = [])
    response = post("/api/v1/tables/create", {
      "table" => table,
      "schema" => { "columns" => columns },
      "primary_key" => primary_key,
    })
    unless response.code.to_i == 201
      raise "HTTP ERROR (#{response.code}): #{response.body[0..128]}"
    end
    true
  end

  def post(path, body)
    request = Net::HTTP::Post.new(path)
    request.add_field("Content-Type", "application/json")
    apply_auth(request)
    request.body = body.to_json
    Net::HTTP.new(host, port).request(request)
  end

  def host
    @opts[:host] || "localhost"
  end

  def port
    @opts[:port] || 9175
  end

  def database
    @opts[:database]
  end

  private

  def apply_auth(request)
    if @opts[:auth_token]
      request.add_field("Authorization", "Token #{@opts[:auth_token]}")
    elsif @opts[:user]
      request.basic_auth(@opts[:user], @opts[:password].to_s)
    end
  end
end
